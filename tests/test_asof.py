"""As-of join correctness vs DuckDB's native ASOF JOIN, both strategies,
strict and non-strict, salted and unsalted."""

import pytest
from pyspark.sql import functions as F

from tests.utils import assert_frames_match
from video_features_spark.operators import asof_join
from video_features_spark.operators.asof import assert_no_leakage


def _feat(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # unique (key, ts) build side => deterministic as-of answer for any engine
    return (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("feat_price"))
        .withColumnRenamed("o_custkey", "user_id")
    )


def _oracle(duck, strict):
    op = ">" if strict else ">="
    return duck.execute(
        f"""
        WITH feat AS (
          SELECT o_custkey AS user_id, o_orderdate, max(o_totalprice) AS feat_price
          FROM orders GROUP BY 1, 2
        )
        SELECT e.user_id, e.ts, e.event_id,
               f.feat_price, f.o_orderdate AS o_orderdate_asof
        FROM events e ASOF LEFT JOIN feat f
          ON e.user_id = f.user_id AND e.ts {op} f.o_orderdate
        """
    ).df()


@pytest.mark.parametrize("strategy", ["window", "merge"])
@pytest.mark.parametrize("strict", [True, False])
def test_asof_matches_duckdb(spark, duck, sf_dir, strategy, strict):
    probe = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "event_id")
    res = asof_join(
        probe, _feat(spark, sf_dir), on=["user_id"], left_ts="ts",
        right_ts="o_orderdate", strict=strict, strategy=strategy,
    )
    assert_frames_match(res.toPandas(), _oracle(duck, strict))


@pytest.mark.parametrize("strategy", ["window", "merge"])
def test_asof_salted_matches_unsalted(spark, sf_dir, strategy):
    probe = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "event_id")
    feat = _feat(spark, sf_dir)
    plain = asof_join(probe, feat, ["user_id"], "ts", "o_orderdate", strategy=strategy)
    # threshold low enough that many keys are "hot" => salting path exercised
    salted = asof_join(
        probe, feat, ["user_id"], "ts", "o_orderdate", strategy=strategy,
        salt_threshold=2, num_salts=4,
    )
    assert_frames_match(salted.toPandas(), plain.toPandas())


def test_leakage_gate(spark, sf_dir):
    probe = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts", "event_id")
    res = asof_join(probe, _feat(spark, sf_dir), ["user_id"], "ts", "o_orderdate", strict=True)
    assert_no_leakage(res, "ts", "o_orderdate_asof", strict=True)
    # matched rows exist at all (the gate isn't vacuous)
    assert res.filter(F.col("o_orderdate_asof").isNotNull()).count() > 0
