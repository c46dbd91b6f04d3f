"""Benchmark entry point (driver-run, per round).

Runs the flagship image pipeline (generate → decode+embed via Arrow UDF →
strict as-of join, fully materialized) at two parallelism levels — the sandbox
stand-in for the north rule's N vs 4N executor scaling criterion — plus the
headline table queries at $SPARK_GRAFT_SF_DIR. Prints ONE JSON line:

  {"metric": "images_per_sec_e2e", "value": <img/s at full cores>, "unit":
   "images/sec", "queries": {<name>: sec, ...}, "sf": 0.1,
   "scaling": {"cores_lo": 8, "cores_hi": 32, "images_per_sec_lo": ...,
               "images_per_sec_hi": ..., "efficiency": ...}}

efficiency = throughput_hi / (throughput_lo * (hi/lo)); target ≥ 0.8
(BASELINE.md). Each level runs in its own subprocess: a local[N] master is
fixed per JVM.
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "100000"))
CORES_LO = max(CPUS // 4, 1)


def run_worker(cores: int, images: int, queries: bool = False, hw: bool = False) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "bench_worker.py"),
        "--cores", str(cores), "--images", str(images), "--sf-dir", SF_DIR,
    ]
    # pin the WHOLE process tree (JVM + python workers) to `cores` host CPUs:
    # in local mode the JVM's scan/shuffle/Arrow threads otherwise leak beyond
    # the local[N] task slots and inflate the low-core measurement
    if os.path.exists("/usr/bin/taskset") and cores <= (os.cpu_count() or cores):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    if queries:
        cmd.append("--queries")
    if hw:
        cmd.append("--hw")
    # own process group: if this script is killed, the worker (and its JVM)
    # must die with it — an orphaned worker pollutes later measurements
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        start_new_session=True,
        env={
            **os.environ,
            "SPARK_GRAFT_CPUS": str(cores),
            # parallelism must come from Spark tasks, not BLAS threads —
            # otherwise the low-core run silently uses every host core and
            # the scaling measurement is fiction
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
        },
    )
    try:
        stdout, stderr = proc.communicate(timeout=1800)
    except (subprocess.TimeoutExpired, KeyboardInterrupt):
        os.killpg(proc.pid, signal.SIGKILL)
        raise
    m = re.search(r"BENCH_JSON:(\{.*\})", stdout)
    if not m:
        sys.stderr.write(stdout[-2000:] + stderr[-4000:])
        raise RuntimeError(f"bench worker (cores={cores}) produced no result")
    return json.loads(m.group(1))


def prepare_data() -> None:
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "bench_worker.py"),
        "--prepare", "--images", str(N_IMAGES),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800, cwd=REPO)
    if "BENCH_JSON:" not in proc.stdout:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError("bench prepare failed")


def main() -> None:
    prepare_data()
    lo = run_worker(CORES_LO, N_IMAGES, queries=False)
    hi = run_worker(CPUS, N_IMAGES, queries=True)
    # hardware ceiling: the identical kernel under a raw multiprocessing pool —
    # on this shared-LLC single box even zero-overhead code can't reach 1.0;
    # a real N→4N *cluster* adds sockets with the nodes, this box doesn't.
    hw_lo = run_worker(CORES_LO, N_IMAGES, hw=True)
    hw_hi = run_worker(CPUS, N_IMAGES, hw=True)
    ratio = CPUS / CORES_LO
    efficiency = hi["images_per_sec"] / (lo["images_per_sec"] * ratio)
    hw_efficiency = hw_hi["images_per_sec"] / (hw_lo["images_per_sec"] * ratio)
    sf = 0.1
    m = re.search(r"sf([\d.]+)", SF_DIR)
    if m:
        sf = float(m.group(1).rstrip("."))
    result = {
        "metric": "images_per_sec_e2e",
        "value": hi["images_per_sec"],
        "unit": "images/sec",
        "queries": hi.get("queries", {}),
        "sf": sf,
        "images": N_IMAGES,
        "e2e_sec": hi["e2e_sec"],
        "scaling": {
            "cores_lo": CORES_LO,
            "cores_hi": CPUS,
            "images_per_sec_lo": lo["images_per_sec"],
            "images_per_sec_hi": hi["images_per_sec"],
            "efficiency": round(efficiency, 3),
            # same kernel, raw multiprocessing pool, no Spark/JVM: what this
            # shared-memory box itself can scale 8→32 (LLC/bandwidth bound)
            "hw_ceiling_images_per_sec_lo": hw_lo["images_per_sec"],
            "hw_ceiling_images_per_sec_hi": hw_hi["images_per_sec"],
            "hw_ceiling_efficiency": round(hw_efficiency, 3),
            # engine-attributable scaling: Spark efficiency relative to the
            # hardware's own ceiling — the north rule's quantity on a real
            # cluster, where 4N executors bring 4x the memory subsystems
            "efficiency_vs_hw_ceiling": round(min(efficiency / hw_efficiency, 1.0), 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
