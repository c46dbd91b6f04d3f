"""Single-parallelism bench worker: runs the flagship image pipeline and the
headline queries at a given core count, prints one JSON line. Invoked as a
subprocess by bench.py (a local[N] master can't change inside one JVM).

Modes
-----
--prepare       : materialize the deterministic synthetic images+labels tables
                  to parquet (the "Iceberg snapshot" stand-in) — untimed setup.
--cores N       : timed run. Pipeline = parquet scan → decode+embed (one
                  mapInPandas pass) → strict as-of join vs labels → full
                  materialization (noop write). Two timed repetitions after a
                  pipeline warmup; best time reported (steady-state throughput,
                  the quantity that scales with executors).
--hw --cores N  : hardware-ceiling probe — the SAME decode+embed kernel run by
                  a raw multiprocessing pool of N workers, no Spark, no JVM.
                  This single-box sandbox shares LLC/memory bandwidth across
                  cores, so even a perfect engine cannot scale 8→32 at 1.0; the
                  pool's 8→32 ratio is the host's ceiling. Spark efficiency is
                  reported raw AND relative to this ceiling (a real N→4N
                  executor cluster adds nodes, not core-contention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# parallelism must come from Spark tasks, not BLAS threads
for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

BENCH_DIR = os.environ.get("BENCH_DATA_DIR", "/tmp/spark_graft_bench")
WARM_IMAGES = 2000  # small table used only to warm JVM/python workers


def materialize(df) -> None:
    """Force full computation of every column (count() alone can let Catalyst
    skip projected work)."""
    df.write.format("noop").mode("overwrite").save()


def img_path(n: int) -> str:
    # scale-study tables (small n) carry a fine 256-file layout so the scan
    # can be split into ~cores*4 balanced tasks at EVERY parallelism level —
    # with 64 coarse files the 32-core run degenerated to one 32-task wave
    # (any straggler stalls the stage) while the 8-core run got 4
    # self-balancing waves, and the asymmetry alone cost ~0.15 of measured
    # 8→32 efficiency. Versioned name: a layout change must not silently
    # reuse a stale coarse table from a previous round. Threshold 200k (was
    # 100k): the amortized scale-study sizes (96k/160k) all need the fine
    # layout; only the 400k headline keeps its established coarse table.
    if n < 200_000:
        return os.path.join(BENCH_DIR, f"images_{n}f256")
    return os.path.join(BENCH_DIR, f"images_{n}")


def lbl_path(n: int) -> str:
    return os.path.join(BENCH_DIR, f"labels_{n}")


def _table_ready(path: str) -> bool:
    """A bare directory check would silently reuse a HALF-WRITTEN table if a
    previous prepare was killed mid-write (the dir appears before the commit);
    Spark's committer drops _SUCCESS only after every file landed."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def prepare(n: int) -> None:
    from video_features_spark.session import get_spark
    from video_features_spark.sources.datagen import generate_images, generate_labels

    spark = get_spark(app_name="bench-prepare")
    spark.sparkContext.setLogLevel("ERROR")
    n_ent = max(n // 50, 1)
    # MUST mirror img_path's fine-layout threshold: a 256-file NAME holding a
    # 64-file table would silently reintroduce the wave-imbalance bias
    parts = min(256, max(n // 50, 8)) if n < 200_000 else 64
    if not _table_ready(img_path(n)):
        generate_images(spark, n, n_entities=n_ent, partitions=parts).write.mode(
            "overwrite"
        ).parquet(img_path(n))
    if not _table_ready(lbl_path(n)):
        generate_labels(spark, n // 2, n_entities=n_ent, partitions=32).write.mode(
            "overwrite"
        ).parquet(lbl_path(n))
    spark.stop()
    print("BENCH_JSON:" + json.dumps({"prepared": n}))


def _hw_chunk(payload: "tuple[list[str], str]") -> int:
    """Pool worker: read its own parquet shard, then decode + preprocess +
    embed with the identical kernel the Spark UDF uses. Workers do their own
    IO — shipping pixel bytes through pool.map would serialize everything
    through the parent's single-threaded pickle and measure IPC, not compute."""
    import pyarrow.parquet as pq

    from video_features_spark.functions.codec import decode_image
    from video_features_spark.functions.embed import preprocess_and_embed

    paths, model = payload
    batch = 256
    done = 0
    for p in paths:
        t = pq.read_table(p, columns=["bytes", "fmt"])
        blobs = t["bytes"].to_pylist()
        fmts = t["fmt"].to_pylist()
        for i in range(0, len(blobs), batch):
            imgs = [
                decode_image(b, f)
                for b, f in zip(blobs[i : i + batch], fmts[i : i + batch])
            ]
            preprocess_and_embed(imgs, model)
            done += len(imgs)
    return done


def hw_ceiling_run(args) -> None:
    """Throughput of the raw kernel under a multiprocessing pool of N workers —
    the no-engine hardware ceiling for this core count (see module docstring).
    File-granular sharding, exactly what a hand-rolled pipeline would do."""
    import glob
    import multiprocessing as mp

    files = sorted(glob.glob(os.path.join(img_path(args.images), "*.parquet")))
    workers = args.cores
    shards = [(files[i::workers], args.model) for i in range(workers)]
    ctx = mp.get_context("spawn")  # no inherited BLAS/thread state
    with ctx.Pool(workers) as pool:
        # warmup: fork + import + one file each (page cache, weight cache)
        pool.map(_hw_chunk, [(s[0][:1], args.model) for s in shards])
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            counts = pool.map(_hw_chunk, shards)
            times.append(time.time() - t0)
        n = sum(counts)
    e2e = min(times)
    print(
        "BENCH_JSON:"
        + json.dumps(
            {"cores": workers, "images": n, "e2e_sec": round(e2e, 3),
             "images_per_sec": round(n / e2e, 2)}
        )
    )


def timed_run(args) -> None:
    from pyspark.sql import functions as F

    from video_features_spark.operators import asof_join
    from video_features_spark.operators.features import extract_image_features
    from video_features_spark.session import get_spark

    # CPU-heavy decode+embed UDF over ~25 KB rows: size input splits to
    # ~cores*4 tasks (4 waves — balanced, straggler-tolerant) at THIS core
    # count. A fixed split size can't serve both parallelism levels of the
    # scaling pair: 16m gave the 8-core run 4 waves but the 32-core run a
    # single 32-task wave. Clamped to [1m, 16m] so the 400k-image headline
    # keeps its established ~16m layout.
    import glob as _glob

    total = sum(
        os.path.getsize(f)
        for f in _glob.glob(os.path.join(img_path(args.images), "*.parquet"))
    )
    split = min(max(total // (args.cores * 4), 1 << 20), 16 << 20) if total else 16 << 20
    spark = get_spark(
        app_name=f"bench-{args.cores}",
        cores=args.cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": "65536",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.queries_only:
        out = {"cores": args.cores}
        _run_queries(spark, args, out)
        spark.stop()
        print("BENCH_JSON:" + json.dumps(out))
        return

    n = args.images

    def pipeline(imgs, labels):
        feats = extract_image_features(imgs, args.model)
        return asof_join(
            labels,
            feats.select("entity_id", "ts", "embedding"),
            on=["entity_id"],
            left_ts="label_ts",
            right_ts="ts",
            strict=True,
        )

    imgs = spark.read.parquet(img_path(n))
    labels = spark.read.parquet(lbl_path(n))
    # generic + pipeline warmup: fork/import the python workers, JIT the JVM.
    # Warmup runs the identical plan on a small pre-prepared table — a full
    # warmup pass at the low core count costs as much as a timed rep and blows
    # the bench budget. (NOT pipeline().limit(k): a limit over mapInPandas
    # collapses to one partition and runs the whole input single-threaded.)
    _warm = F.pandas_udf(lambda s: s, "long")
    materialize(spark.range(100_000, numPartitions=args.cores * 4).select(_warm("id")))
    warm_n = WARM_IMAGES if os.path.exists(img_path(WARM_IMAGES)) else n
    materialize(
        pipeline(spark.read.parquet(img_path(warm_n)), spark.read.parquet(lbl_path(warm_n)))
    )
    # page-cache + footer prewarm of the ACTUAL input (JVM-only, ~0.2 s): the
    # first timed rep otherwise pays cold reads of the main table that the
    # small-twin warmup never touched
    materialize(imgs)
    materialize(labels)

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        materialize(pipeline(imgs, labels))
        times.append(round(time.time() - t0, 3))
    e2e = min(times)

    out = {
        "cores": args.cores,
        "images": n,
        "e2e_sec": round(e2e, 3),
        "images_per_sec": round(n / e2e, 2),
        "rep_secs": times,
    }

    if args.queries:
        _run_queries(spark, args, out)

    spark.stop()
    print("BENCH_JSON:" + json.dumps(out))


# Degraded-window insurance for the per-query table. A single-shot timing is
# hostage to this host's sporadic 30-60 s co-tenant slowdown windows: the same
# query has measured 6.5 s (clean window) and 29.3 s (host_ratio ~3.0) across
# identical-code runs, and the shipped number is whichever window the driver's
# one bench run happened to hit. Any query whose first timing exceeds its
# clean-window ceiling (~1.5x the slowest clean capture in BASELINE.md's
# bands; new-this-round queries get generous ceilings) is re-timed once inside
# a bounded retry budget, cheapest inflated query first (most rescues per
# retry second). The artifact ships the min AND lists every retried query with
# both timings, so a degraded-window run is labeled rather than argued about.
# Ceilings re-pinned r7 (the r6 verdict's "re-pin the per-query clean-window
# bands" item): the optimization round moved the clean cold bands to roughly
# curate 10-12 s, dedup_groups 8.5-10, minhash 5.5-6.6, video_frames 2.6-3.6,
# stream_asof 4-5, image_checkpoint_weights 1.4-2.1 (driver-methodology
# samples in OPTIMIZATION_r07.md). Ceilings sit ~1.7-2x above the band so a
# degraded-window first timing triggers the bounded retry (both timings
# always ship in queries_retried); the r6 values would have let a 2x-degraded
# run pass unretried at the new speeds. Tightened again after two more
# fresh-sandbox samples: a degraded run shipped curate 17.4 (band 10-12) and
# video_frames 7.35 (band 2.6-5.8) just under the first-pass ceilings, and
# caption_bpe spiked to 5.0 (band 0.9-1.5) under the old 6.0 default — no
# unlisted query's clean cold timing has been observed above 3.8.
QUERY_RETRY_CEILING = {
    "curate_corpus": 16.0,
    "dedup_groups": 16.0,
    "minhash_lsh_dedup": 11.0,
    "video_frames": 6.5,
    "stream_tumbling": 6.0,
    "stream_asof": 8.0,
    "checkpoint_resume": 9.0,
    "embedding_near_dup_blocked": 7.0,
    "image_checkpoint_weights": 6.0,
    "bucketed_join": 7.0,
}
DEFAULT_RETRY_CEILING = float(os.environ.get("BENCH_QUERY_RETRY_CEILING", "4.5"))
RETRY_BUDGET_SEC = float(os.environ.get("BENCH_QUERY_RETRY_BUDGET", "75.0"))


def retry_plan(qtimes: dict, budget: float = RETRY_BUDGET_SEC) -> list:
    """Which queries to re-time, in order. Pure function (unit-gated in
    tests/test_bench_harness.py). Estimated retry cost = the first-pass
    timing (an upper bound when the window has cleared); cheapest inflated
    query first so a tight budget rescues the most entries."""
    over = [
        n for n, t in qtimes.items()
        if t > QUERY_RETRY_CEILING.get(n, DEFAULT_RETRY_CEILING)
    ]
    over.sort(key=lambda n: qtimes[n])
    plan, spend = [], 0.0
    for n in over:
        if spend + qtimes[n] > budget:
            break
        plan.append(n)
        spend += qtimes[n]
    return plan


def _run_queries(spark, args, out: dict) -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    qtimes = {}
    qs = entrymod.queries()
    # warm the JVM + python workers so the FIRST query doesn't absorb
    # session startup into its recorded time
    _warm = F.pandas_udf(lambda s: s, "long")
    materialize(spark.range(50_000, numPartitions=args.cores * 2).select(_warm("id")))
    materialize(qs["asof_window"](spark, args.sf_dir))
    headline = [
        "asof_window", "asof_merge", "asof_salted", "lag_lead", "backfill",
        "sessionize", "resample", "topk_per_group", "sliding_stacks",
        "tumbling_daily", "tpch_q1", "tpch_q3", "dedup_exact", "cosine_topk",
        "token_count", "embedding_quantize", "rolling_7d", "percentiles",
        "bucketed_join",
        # dedup/text suite (the scale-path operators need timings too)
        "curate_corpus", "dedup_groups", "minhash_lsh_dedup",
        "embedding_near_dup_blocked", "ann_lsh_topk", "simhash_sigs",
        "langid_ngram", "text_quality",
        # round-4 additions: S9 resume, §2.8 streaming parity, dense flow
        "checkpoint_resume", "stream_asof", "image_pair_flow_field",
        "video_frames",
        # round-5 additions: consolidated OLAP entries + the new seam queries
        "grouping_sets_sales", "distinct_guard", "stream_tumbling",
        "image_checkpoint_weights", "caption_bpe",
    ]
    for name in headline:
        t0 = time.time()
        materialize(qs[name](spark, args.sf_dir))
        qtimes[name] = round(time.time() - t0, 3)
    retried = {}
    # the plan bounds ESTIMATED spend; this loop additionally bounds REAL
    # wall-clock (advice r5: a persisting degraded window can make each retry
    # run far past its first-pass estimate, overrunning the phase reserve)
    retry_t0 = time.time()
    for name in retry_plan(qtimes):
        if time.time() - retry_t0 > RETRY_BUDGET_SEC:
            break
        t0 = time.time()
        materialize(qs[name](spark, args.sf_dir))
        dt = round(time.time() - t0, 3)
        # warm-rerun bias note: the retry reruns in the same warm session, so
        # min(first, retry) is best-of-two, not single-shot — both timings
        # ship in queries_retried so consumers can see which semantics apply
        retried[name] = [qtimes[name], dt]
        qtimes[name] = min(qtimes[name], dt)
    out["queries"] = qtimes
    if retried:
        out["queries_retried"] = retried


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--images", type=int, default=20000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--model", default="clip-small-det")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", action="store_true")
    ap.add_argument("--queries-only", action="store_true")
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--hw", action="store_true")
    args = ap.parse_args()
    if args.prepare:
        prepare(args.images)
    elif args.queries_only:
        timed_run(args)
    elif args.hw:
        hw_ceiling_run(args)
    else:
        timed_run(args)


if __name__ == "__main__":
    main()
