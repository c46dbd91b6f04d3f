"""Bucketed co-location gates: a join of two same-bucketed tables and a window
over a bucketed table must plan WITHOUT an Exchange on the bucketed side —
the storage-layout half of the 100 TB scale story."""

import pytest
from pyspark.sql import Window, functions as F

from video_features_spark.sources.bucketed import drop_table, read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    feat = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("feat_price"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    write_bucketed(ev, "ev_b", ["user_id"], 8, sort_cols=["user_id", "ts"],
                   path=str(tmp_path / "ev_b"))
    write_bucketed(feat, "feat_b", ["user_id"], 8, path=str(tmp_path / "feat_b"))
    yield "ev_b", "feat_b"
    drop_table(spark, "ev_b")
    drop_table(spark, "feat_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_equijoin_has_no_exchange(spark, bucketed_pair):
    ev_b, feat_b = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ev_b).join(read_bucketed(spark, feat_b), "user_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually computes
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_window_over_bucketed_table_has_no_exchange(spark, bucketed_pair):
    """The as-of join's window pass partitions by the entity key; over a
    bucketed-by-key table that exchange disappears entirely."""
    ev_b, _ = bucketed_pair
    w = Window.partitionBy("user_id").orderBy("ts")
    df = read_bucketed(spark, ev_b).withColumn("rn", F.row_number().over(w))
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert df.count() == 1000


def test_unbucketed_baseline_does_exchange(spark, sf_dir):
    """Sanity: the same join over plain parquet DOES shuffle — proving the
    bucketing (not table size) is what removed the exchange above."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        feat = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy("o_custkey").agg(F.max("o_totalprice").alias("p"))
            .withColumnRenamed("o_custkey", "user_id")
        )
        plan = _plan(ev.join(feat, "user_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
