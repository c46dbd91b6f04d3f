"""Resume-from-checkpoint gates (SURVEY §5: kill after partition k, rerun,
identical output, no recompute of completed partitions)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from video_features_spark.operators.features import extract_image_features
from video_features_spark.sources.checkpoint import (
    PART_COL,
    checkpointed_write,
    load_manifest,
    read_checkpointed,
    verify_manifest,
    with_partition_id,
)
from video_features_spark.sources.datagen import generate_images

N_PARTS = 8


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "ckpt")


def _features(spark, n=120):
    imgs = generate_images(spark, n, n_entities=6)
    return extract_image_features(imgs, "clip-small-det").drop("error")


def test_full_write_then_all_skipped(spark, base):
    feats = _features(spark)
    s1 = checkpointed_write(feats, base, ["entity_id"], num_parts=N_PARTS)
    assert s1["parts_skipped"] == 0 and s1["rows_written"] == 120
    s2 = checkpointed_write(feats, base, ["entity_id"], num_parts=N_PARTS)
    assert s2["parts_skipped"] == s1["parts_written"]
    assert s2["rows_written"] == 0
    assert read_checkpointed(spark, base).count() == 120


def test_resume_after_partial_failure(spark, base):
    """Simulate a job killed mid-run: first run covers only some partitions
    (failure injected by filtering), resume completes the rest; final output
    equals a clean one-shot run exactly."""
    feats = _features(spark)
    keyed = with_partition_id(feats, ["entity_id"], N_PARTS)
    survived = [r[PART_COL] for r in keyed.select(PART_COL).distinct().collect()][:2]
    partial = keyed.filter(F.col(PART_COL).isin(survived)).drop(PART_COL)
    s1 = checkpointed_write(partial, base, ["entity_id"], num_parts=N_PARTS)
    assert s1["parts_written"] == len(survived)

    s2 = checkpointed_write(feats, base, ["entity_id"], num_parts=N_PARTS)
    assert s2["parts_skipped"] == len(survived)  # completed parts NOT recomputed

    got = read_checkpointed(spark, base)
    assert got.count() == 120
    # value-identical to a clean run (embeddings deterministic, so exact)
    clean = {r["image_id"]: r["embedding"] for r in _features(spark).collect()}
    res = {r["image_id"]: r["embedding"] for r in got.collect()}
    assert res == clean


def test_no_recompute_proof_via_accumulator(spark, base):
    """The expensive stage must not run for completed partitions: count UDF
    invocations with an accumulator across the resume run."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def expensive(x):
        acc.add(1)
        return x

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("k")
    ).withColumn("v", expensive(F.col("id").cast("int")))

    checkpointed_write(df, base, ["k"], num_parts=4)
    first_calls = acc.value
    assert first_calls >= 100
    checkpointed_write(df, base, ["k"], num_parts=4)
    assert acc.value == first_calls, "resume run recomputed completed partitions"


def test_verify_manifest_detects_corruption(spark, base):
    feats = _features(spark)
    checkpointed_write(feats, base, ["entity_id"], num_parts=N_PARTS)
    assert verify_manifest(spark, base).count() == 0  # healthy
    # corrupt one data partition: delete its files
    import glob, os

    part_dir = sorted(glob.glob(f"{base}/data/{PART_COL}=*"))[0]
    shutil.rmtree(part_dir)
    bad = verify_manifest(spark, base)
    assert bad.count() >= 1  # drift detected


def test_snapshot_isolation(spark, base):
    """Different snapshot ids keep independent completion state (lineage)."""
    feats = _features(spark, n=60)
    checkpointed_write(feats, base, ["entity_id"], num_parts=4, snapshot_id="snapA")
    s = checkpointed_write(feats, base, ["entity_id"], num_parts=4, snapshot_id="snapB")
    assert s["parts_skipped"] == 0  # snapB starts fresh
    m = load_manifest(spark, base)
    assert {r["snapshot_id"] for r in m.select("snapshot_id").distinct().collect()} == {"snapA", "snapB"}


def test_write_restores_session_conf(spark, base):
    from video_features_spark.sources.checkpoint import checkpointed_write

    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    df = spark.range(100).withColumn("k", F.col("id") % 10)
    checkpointed_write(df, base, ["k"], num_parts=4)
    assert spark.conf.get(key) == "static"  # shared session not mutated
    spark.conf.unset(key)


def test_verify_clean_after_multi_snapshot_overwrite(spark, base):
    """Re-using a base with a NEW snapshot overwrites partitions; verify must
    trust only the latest manifest row per partition — no false drift."""
    from video_features_spark.sources.checkpoint import checkpointed_write, verify_manifest

    df1 = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(1))
    checkpointed_write(df1, base, ["k"], num_parts=4, snapshot_id="snap-1")
    df2 = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(2))
    checkpointed_write(df2, base, ["k"], num_parts=4, snapshot_id="snap-2")
    drift = verify_manifest(spark, base)
    assert drift.count() == 0, drift.collect()


def test_compact_manifest_keeps_latest_and_verifies(spark, base):
    """The append-only manifest compacts to one row per partition (latest
    manifest_seq); resume still skips everything and verify still reports no
    drift against the surviving rows."""
    from video_features_spark.sources.checkpoint import compact_manifest

    df1 = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(1))
    checkpointed_write(df1, base, ["k"], num_parts=4, snapshot_id="snap-1")
    df2 = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(2))
    checkpointed_write(df2, base, ["k"], num_parts=4, snapshot_id="snap-2")
    stats = compact_manifest(spark, base)
    assert stats["rows_before"] == 8 and stats["rows_after"] == 4
    assert verify_manifest(spark, base).count() == 0
    # resume against the compacted manifest: latest snapshot fully skipped
    again = checkpointed_write(df2, base, ["k"], num_parts=4, snapshot_id="snap-2")
    assert again["parts_skipped"] == 4 and again["parts_written"] == 0


def test_compaction_crash_recovery(spark, base):
    """A compaction killed between its two renames leaves no _manifest but a
    .__compact_old — the next manifest read must self-heal (otherwise resume
    recomputes EVERYTHING), and a later compaction must not wedge on the
    leftover."""
    import os

    from video_features_spark.sources.checkpoint import compact_manifest

    df = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(1))
    checkpointed_write(df, base, ["k"], num_parts=4)
    man = os.path.join(base, "_manifest")
    os.rename(man, man + ".__compact_old")  # crash fell between the renames
    again = checkpointed_write(df, base, ["k"], num_parts=4)
    assert again["parts_skipped"] == 4 and again["parts_written"] == 0  # healed
    stats = compact_manifest(spark, base)  # leftover must not wedge it
    assert stats["rows_after"] == 4


def test_compaction_generation_pointer_protocol(spark, base):
    """Pointer-based compaction (object-store-safe: NO directory rename):
    each compaction writes a fresh _manifest.g<N> dir then atomically flips
    the one-line _manifest.ptr file; appends land in the current generation;
    superseded generations are removed by the compactor only."""
    import os

    from video_features_spark.sources import checkpoint as C

    df1 = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(1))
    checkpointed_write(df1, base, ["k"], num_parts=4, snapshot_id="snap-1")
    s1 = C.compact_manifest(spark, base)
    assert s1["generation"] == 0 and s1["rows_after"] == 4
    assert C._current_generation(base) == 0
    # GRACE PERIOD: the just-superseded legacy dir survives one compaction —
    # a reader that resolved it an instant before the flip may still read it
    assert os.path.exists(C._manifest_path(base))
    # appends now land in the generation dir; verify + resume stay exact
    df2 = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(2))
    checkpointed_write(df2, base, ["k"], num_parts=4, snapshot_id="snap-2")
    assert verify_manifest(spark, base).count() == 0
    s2 = C.compact_manifest(spark, base)
    assert s2["generation"] == 1 and s2["rows_after"] == 4
    assert not os.path.exists(C._manifest_path(base))  # legacy retired now
    assert os.path.exists(C._gen_dir(base, 0))  # grace: gen 0 survives once
    s3 = C.compact_manifest(spark, base)
    assert s3["generation"] == 2
    assert not os.path.exists(C._gen_dir(base, 0))  # two generations behind
    assert os.path.exists(C._gen_dir(base, 1))  # grace for the new superseded
    again = checkpointed_write(df2, base, ["k"], num_parts=4, snapshot_id="snap-2")
    assert again["parts_skipped"] == 4 and again["parts_written"] == 0


def test_compaction_crash_before_flip_reader_safe(spark, base, monkeypatch):
    """Simulated non-atomic swap window: the compactor dies AFTER writing the
    new generation dir but BEFORE flipping the pointer. A racing reader must
    see the old, complete manifest and must NOT delete the orphan dir (the
    r4 rename protocol failed exactly here); the next compaction absorbs the
    orphan and resume stays exact."""
    import os

    from video_features_spark.sources import checkpoint as C

    df = spark.range(100).withColumn("k", F.col("id") % 10).withColumn("v", F.lit(1))
    checkpointed_write(df, base, ["k"], num_parts=4)
    C.compact_manifest(spark, base)  # generation 0
    monkeypatch.setattr(
        C, "_flip_pointer",
        lambda *a: (_ for _ in ()).throw(RuntimeError("crash before flip")),
    )
    with pytest.raises(RuntimeError, match="crash before flip"):
        C.compact_manifest(spark, base)
    monkeypatch.undo()
    # mid-window state: orphan gen-1 dir, pointer still names gen 0
    assert os.path.exists(C._gen_dir(base, 1))
    assert C._current_generation(base) == 0
    # reader in the window: complete manifest, orphan untouched
    m = C.load_manifest(spark, base)
    assert m is not None and m.count() == 4
    assert os.path.exists(C._gen_dir(base, 1))
    # next compaction overwrites the orphan and completes the flip
    s = C.compact_manifest(spark, base)
    assert s["generation"] == 1
    again = checkpointed_write(df, base, ["k"], num_parts=4)
    assert again["parts_skipped"] == 4 and again["parts_written"] == 0
    assert verify_manifest(spark, base).count() == 0
