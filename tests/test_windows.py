"""Window operators vs DuckDB SQL oracles."""

from pyspark.sql import functions as F

from tests.utils import assert_frames_match
from video_features_spark.operators import (
    backfill,
    lag_lead,
    resample,
    sessionize,
    sliding_stacks,
    top_k,
)


def test_lag_lead(spark, duck, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = lag_lead(ev, ["user_id"], "ts", "value").select(
        "event_id", "user_id", "ts", "value", "value_lag1", "value_lead1"
    )
    oracle = duck.execute(
        """
        SELECT event_id, user_id, ts, value,
               lag(value) OVER w AS value_lag1,
               lead(value) OVER w AS value_lead1
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    ).df()
    assert_frames_match(res.toPandas(), oracle)


def test_backfill(spark, duck, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value", F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value"))
    )
    res = backfill(ev, ["user_id"], "ts", ["value"]).select(
        "event_id", "user_id", "ts", "value", "value_filled"
    )
    oracle = duck.execute(
        """
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS value,
               last_value(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        FROM events
        """
    ).df()
    assert_frames_match(res.toPandas(), oracle)


def test_sessionize(spark, duck, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = sessionize(ev, ["user_id"], "ts", 1800).select("event_id", "user_id", "ts", "session_id")
    oracle = duck.execute(
        """
        SELECT event_id, user_id, ts,
               sum(CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events)
        """
    ).df()
    assert_frames_match(res.toPandas(), oracle)


def test_top_k(spark, duck, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = top_k(orders, ["o_custkey"], "o_totalprice", 5).select(
        "o_orderkey", "o_custkey", "o_totalprice", "rank"
    )
    oracle = duck.execute(
        """
        SELECT o_orderkey, o_custkey, o_totalprice, rank FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_custkey) AS rank
          FROM orders)
        WHERE rank <= 5
        """
    ).df()
    a = res.toPandas()
    b = oracle
    # ties in o_totalprice make per-row identity ambiguous; compare the
    # deterministic projection (custkey, price, rank)
    assert_frames_match(a[["o_custkey", "o_totalprice", "rank"]],
                        b[["o_custkey", "o_totalprice", "rank"]])


def test_resample(spark, duck, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = resample(ev, ["user_id"], "ts", 86400.0).select("user_id", "ts")
    oracle = duck.execute(
        """
        SELECT user_id, ts FROM (
          SELECT user_id, ts,
                 row_number() OVER (PARTITION BY user_id, floor(epoch(ts)/86400.0)
                                    ORDER BY ts) AS rn
          FROM events)
        WHERE rn = 1
        """
    ).df()
    assert_frames_match(res.toPandas(), oracle)


def test_sliding_stacks(spark, duck, sf_dir):
    """form_slices semantics (reference utils/utils.py:62-71): complete windows
    only, stride step, aggregate over stack, end-ts = last row of window."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = sliding_stacks(ev, ["user_id"], "ts", "value", stack_size=8, step_size=4, agg="avg")
    res = res.select("user_id", "stack_start_idx", "stack_agg", "stack_end_ts")
    oracle = duck.execute(
        """
        WITH idx AS (
          SELECT user_id, ts, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM events)
        SELECT user_id, i AS stack_start_idx,
               avg(value) OVER w AS stack_agg,
               last_value(ts) OVER w AS stack_end_ts
        FROM idx
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
        QUALIFY i % 4 = 0 AND i + 8 <= n
        """
    ).df()
    assert_frames_match(res.toPandas(), oracle)
