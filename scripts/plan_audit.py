"""Physical-plan audit: assert the plan shapes we designed for actually hold
(pushdown, pruning, shared window exchanges, broadcast joins). Run after
operator changes: python scripts/plan_audit.py [sf_dir]."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from video_features_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(sf_dir: str) -> int:
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    failures = []

    # 1. predicate pushdown + column pruning reach the scan
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    p = plan_of(q)
    if "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" not in p:
        failures.append("tpch filter NOT pushed to scan")
    if "l_extendedprice" in p:
        failures.append("tpch scan reads unprojected columns")

    # 2. chained window ops over one (key, order) spec share a single sort
    from video_features_spark.operators import backfill, lag_lead, sessionize

    chained = backfill(
        sessionize(lag_lead(ev, ["user_id"], "ts", "value"), ["user_id"], "ts", 1800),
        ["user_id"],
        "ts",
        ["value"],
    )
    n_sorts = plan_of(chained).count(" Sort ")
    if n_sorts > 1:
        failures.append(f"chained windows use {n_sorts} sorts (expected 1 shared)")

    # 3. small-side joins broadcast (never SortMergeJoin for the query side)
    import __spark_entry__ as entrymod

    p = plan_of(entrymod.queries()["cosine_topk"](spark, sf_dir))
    if "SortMergeJoin" in p:
        failures.append("cosine_topk fell back to SortMergeJoin")
    if "BroadcastExchange" not in p:
        failures.append("cosine_topk query side not broadcast")

    # 4. image pipeline reads only the columns it needs
    from video_features_spark.operators.features import extract_image_features
    from video_features_spark.sources.datagen import generate_images

    import tempfile

    d = tempfile.mkdtemp(prefix="audit_imgs_")
    generate_images(spark, 50, n_entities=2).write.mode("overwrite").parquet(d)
    p = plan_of(extract_image_features(spark.read.parquet(d)))
    read_line = next(line for line in p.splitlines() if "ReadSchema" in line)
    for unneeded in ("caption", "phash", "w:", "h:"):
        if unneeded in read_line:
            failures.append(f"image pipeline scan reads unneeded column {unneeded}")

    # 5. as-of join (window strategy): exactly ONE exchange feeding one sort —
    #    union both sides, hash-partition on the key, sort within partitions,
    #    streaming window frame. No Python stage, no N×M join.
    from video_features_spark.operators import asof_join

    probe = ev.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    build = ev.select("user_id", F.col("ts").cast("timestamp").alias("fts"), "value")
    p = plan_of(
        asof_join(probe, build, on=["user_id"], left_ts="ts", right_ts="fts", strict=True)
    )
    n_exchanges = p.count(" Exchange ")
    if n_exchanges > 1:
        failures.append(f"asof window strategy has {n_exchanges} exchanges (expected 1)")
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        if bad in p:
            failures.append(f"asof window strategy runs Python ({bad})")

    # 6. image decode+embed pipeline: embarrassingly parallel — NO shuffle
    p = plan_of(extract_image_features(spark.read.parquet(d)))
    if " Exchange " in p:
        failures.append("image pipeline shuffles (should be map-only)")

    # 7. LSH verify touches only candidate pairs: the pair list broadcasts
    #    into the shingle table (no full-corpus shingle self-join)
    p = plan_of(entrymod.queries()["minhash_lsh_dedup"](spark, sf_dir))
    if "BroadcastExchange" not in p:
        failures.append("minhash verify does not broadcast the candidate pairs")

    # 8. blocked near-dup: bucket-join, never a nested-loop over the corpus
    p = plan_of(entrymod.queries()["embedding_near_dup_blocked"](spark, sf_dir))
    if "BroadcastNestedLoopJoin" in p or "CartesianProduct" in p:
        failures.append("blocked near-dup plans a nested-loop join")

    # 10. jaccard_on_pairs auto-switch: a candidate set above the broadcast
    #     cap plans a SHUFFLE join (no executor-memory broadcast), a small one
    #     broadcasts. Catalyst's own size-based auto-broadcast is disabled for
    #     the check so any BroadcastExchange left is the operator's explicit
    #     F.broadcast.
    from video_features_spark.operators.dedup import (
        jaccard_on_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingle_table(docs, "doc_id", "text", 5)
    cands = lsh_candidate_pairs(minhash_signatures(docs, "doc_id", "text"), "doc_id")
    prior_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_small = plan_of(jaccard_on_pairs(sh, cands, "doc_id"))
        p_big = plan_of(jaccard_on_pairs(sh, cands, "doc_id", max_broadcast_pairs=0))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_thresh)
    if "BroadcastExchange" not in p_small:
        failures.append("jaccard auto-switch: small candidate set not broadcast")
    if "BroadcastExchange" in p_big:
        failures.append("jaccard auto-switch: over-cap candidate set still broadcasts")

    # 11. video container → frame stream → decode+embed: the whole chain is
    #     map-only (zero Exchange) — the property that scales with executors
    from video_features_spark.operators.video import extract_video_frames
    from video_features_spark.sources.datagen import generate_videos

    vids = generate_videos(spark, 4, n_entities=2)
    frames = extract_video_frames(vids).filter(F.col("error").isNull())
    chain = extract_image_features(
        frames.select(
            F.col("video_id").alias("image_id"), "entity_id",
            F.col("frame_ts").alias("ts"), "bytes", "fmt",
        )
    )
    if " Exchange " in plan_of(chain):
        failures.append("video frame pipeline shuffles (should be map-only)")

    # 12. set-based verify: the WIDE shingle-set sides must never broadcast
    #     (Catalyst's parquet-derived stats underestimate in-row array width
    #     by ~1000x) — the only BroadcastExchange allowed feeds the candidate
    #     pair list / id semi-filters, and both set joins are shuffle-hash
    from video_features_spark.operators.dedup import minhash_dedup

    p = plan_of(minhash_dedup(docs, "doc_id", "text", 32, 8, 5, 0.5))
    if "ShuffledHashJoin" not in p:
        failures.append("set verify does not shuffle-hash the wide set sides")
    # formatted explain prints one detail block per node: any BroadcastExchange
    # whose Input mentions a shingle-set column is the bug this audit pins
    for block in p.split("\n\n"):
        if "BroadcastExchange" in block and ("__sa" in block or "__sb" in block or "__sset" in block):
            failures.append("set verify broadcasts a shingle-set side")
            break

    # 12b. the over-cap / 100 TB verify shape, audited DIRECTLY: at audit
    #      scale minhash_dedup's bounded probe always localizes the
    #      candidates, so the shuffle-pairs production variant (the one a
    #      1000-executor run with millions of candidates takes) would
    #      otherwise never be shape-asserted — a regression that broadcasts
    #      the wide set side in THAT path is exactly the bug this audit
    #      exists to pin. Building this plan runs no probe and no jobs.
    from video_features_spark.operators.dedup import (
        jaccard_on_pair_sets,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    cands_lazy = lsh_candidate_pairs(
        minhash_signatures(docs, "doc_id", "text", 32, 5), "doc_id", 8
    )
    p = plan_of(
        jaccard_on_pair_sets(
            docs, cands_lazy, "doc_id", "text", 5, 0.5, broadcast_pairs=False
        )
    )
    if "ShuffledHashJoin" not in p:
        failures.append("forced-shuffle set verify lost its shuffle-hash joins")
    for block in p.split("\n\n"):
        if "BroadcastExchange" in block and ("__sa" in block or "__sb" in block or "__sset" in block):
            failures.append("forced-shuffle set verify broadcasts a shingle-set side")
            break

    # 9. IVF centroid sample: top-k, not a global sort
    from video_features_spark.operators.similarity import _l2  # noqa: F401

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sampled = (
        emb.select(F.xxhash64("vec_id").alias("__h"), "embedding").orderBy("__h").limit(64)
    )
    p = plan_of(sampled)
    if "TakeOrderedAndProject" not in p:
        failures.append("IVF sample does not compile to TakeOrderedAndProject")

    spark.stop()
    if failures:
        print("PLAN AUDIT FAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print("plan audit: all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
