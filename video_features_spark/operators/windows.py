"""Windowed temporal operators: lag/lead, backfill, sessionize, resample,
sliding stacks, tumbling aggregation, top-k.

These generalize the reference's frame-window machinery into real event-time
operators (reference citations per function). Everything here is pure DataFrame
API — no Python UDFs — so Catalyst gets full visibility: filters push to the
scan, window exchanges hash-partition on the entity key only (one shuffle,
reused across chained window functions on the same key), and whole-stage
codegen covers every expression.

Scale notes (100 TB / 1000 executors):
- All functions partition by the entity key; skewed entities are bounded by
  per-entity cardinality, not table size. AQE skew handling stays on as a
  backstop (session.py).
- Chaining multiple window ops over the SAME (key, order) spec costs ONE
  shuffle: Spark reuses the child exchange. The functions below deliberately
  share the spec for that reason.
- ``sliding_stacks`` uses rowsBetween (bounded frame) — state is O(stack),
  never O(entity history).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _w(entity_cols: Sequence[str], order_col: str, tiebreak_col: str | None = None):
    # optional unique tiebreak keeps results deterministic (and oracle-equal)
    # when the order column has ties within an entity
    order = [order_col] if tiebreak_col is None else [order_col, tiebreak_col]
    return Window.partitionBy(*entity_cols).orderBy(*order)


def _epoch_seconds(col: Column) -> Column:
    # TIMESTAMP_NTZ (driver parquet) can't cast straight to double in Spark 4;
    # go via timestamp first. Numeric order columns pass through unchanged.
    return col.cast("timestamp").cast("double")


def lag_lead(
    df: DataFrame,
    entity_cols: Sequence[str],
    order_col: str,
    value_col: str,
    offsets: Sequence[int] = (1,),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-entity lag/lead columns over event time.

    Generalizes the reference's consecutive-frame pairing for optical flow
    (``/root/reference/models/_base/base_flow_extractor.py:78-84`` pairs frame t
    with t+1 via an overlap=1 batch cache, ``/root/reference/utils/io.py:120-126``).
    The overlap cache exists only because the reference windows *inside* its
    batcher; in DataFrame land ``F.lag/F.lead`` frames span Arrow-batch
    boundaries for free.
    """
    w = _w(entity_cols, order_col, tiebreak_col)
    out = df
    for k in offsets:
        out = out.withColumn(f"{value_col}_lag{k}", F.lag(value_col, k).over(w))
        out = out.withColumn(f"{value_col}_lead{k}", F.lead(value_col, k).over(w))
    return out


def backfill(
    df: DataFrame,
    entity_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    direction: str = "forward",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Fill nulls from the last (or next) non-null observation per entity.

    North-rule operator ("backfill of missing captions/embeddings"); no
    reference analog — the reference *skips* entire files on missing data
    (``/root/reference/models/_base/base_extractor.py:40-53``), we repair rows.
    forward: last non-null at or before the row; backward: next at or after.
    """
    if direction == "forward":
        w = _w(entity_cols, order_col, tiebreak_col).rowsBetween(Window.unboundedPreceding, 0)
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    elif direction == "backward":
        w = _w(entity_cols, order_col, tiebreak_col).rowsBetween(0, Window.unboundedFollowing)
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(f"direction must be forward|backward, got {direction!r}")
    out = df
    for c in value_cols:
        out = out.withColumn(f"{c}_filled", fill(c))
    return out


def sessionize(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    previous event of the same entity exceeds ``gap_seconds``.

    North-rule operator ("phash-keyed sessionization"). Classic gaps-and-islands:
    session id = running sum of is-new-session flags — two window functions over
    ONE partitioning, so one shuffle total.
    """
    w = _w(entity_cols, ts_col, tiebreak_col)
    prev_ts = F.lag(ts_col).over(w)
    gap = _epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(0)
    return df.withColumn(session_col, F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def resample(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    every_seconds: float,
    keep: str = "first",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep one row per (entity, time-bucket): row resampling as a *filter*.

    Spark-first replacement for the reference's fps re-encode — it shells out to
    ffmpeg to resample the input *before* decode
    (``/root/reference/utils/io.py:14-36``, used at ``io.py:79,88``). Here the
    same semantics are a window rank + filter that Catalyst can push around; at
    the source level the bucket predicate partition-prunes on Iceberg.
    """
    bucket = F.floor(_epoch_seconds(F.col(ts_col)) / F.lit(float(every_seconds)))
    order = [F.asc(ts_col)] if keep == "first" else [F.desc(ts_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(*entity_cols, bucket).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by ``order_col``.

    Generalizes the reference's top-5 prediction ranking
    (``/root/reference/utils/utils.py:40-46``: softmax → sort desc → take 5).
    row_number (not rank) ⇒ deterministic k rows; map-side partial limit is
    applied by Spark's WindowGroupLimit optimization before the shuffle.
    """
    order = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(*partition_cols).orderBy(order, *partition_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sliding_stacks(
    df: DataFrame,
    entity_cols: Sequence[str],
    order_col: str,
    value_col: str,
    stack_size: int,
    step_size: int,
    agg: str = "count",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Complete sliding windows of ``stack_size`` rows advanced by ``step_size``,
    aggregating ``value_col`` per window; partial (incomplete) windows dropped.

    Direct generalization of ``form_slices``
    (``/root/reference/utils/utils.py:62-71``: emits ``(size-stack)//step+1``
    complete slices) and the I3D rolling stack
    (``/root/reference/models/i3d/extract_i3d.py:115-124``: fire when full, then
    drop ``step_size`` head rows; window timestamp = last frame's ts — we keep
    that detail: ``stack_end_ts`` is the ts of the window's last row).

    Implementation: per-entity row index (one shuffle), then a bounded
    rowsBetween(0, stack-1) frame + a stride/completeness filter. For an
    aggregate over a *forward* frame we also grab the frame-end timestamp via
    the same window spec.
    """
    # sum/avg accumulate in decimal and cast to double AFTER (rolling_range_agg
    # rationale): Spark evaluates the frame in sorted order but DuckDB's
    # segment-tree windowed sums do not, so a float frame-sum can differ in
    # its last ulp between engines; decimal addition is associative/exact.
    # NOTE (documented semantics, r6 advice): "avg" divides by the FRAME ROW
    # COUNT (count(*)), not the non-null count — it differs from F.avg when
    # value_col contains nulls. The oracle pins the same definition.
    aggs = {
        "count": lambda c, w: F.count(c).over(w),
        "sum": lambda c, w: F.sum(c.cast("decimal(18,6)")).over(w).cast("double"),
        "avg": lambda c, w: (
            F.sum(c.cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ),
        "min": lambda c, w: F.min(c).over(w),
        "max": lambda c, w: F.max(c).over(w),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}")
    w_order = _w(entity_cols, order_col, tiebreak_col)
    w_frame = w_order.rowsBetween(0, stack_size - 1)
    idx = F.row_number().over(w_order) - 1  # 0-based, reference's frame index
    n = F.count(F.lit(1)).over(Window.partitionBy(*entity_cols))
    return (
        df.withColumn("_idx", idx)
        .withColumn("_n", n)
        .withColumn("stack_agg", aggs[agg](F.col(value_col), w_frame))
        .withColumn("stack_end_ts", F.last(order_col).over(w_frame))
        # form_slices semantics: start at idx 0, advance by step, keep complete only
        .filter((F.col("_idx") % step_size == 0) & (F.col("_idx") + stack_size <= F.col("_n")))
        .withColumnRenamed("_idx", "stack_start_idx")
        .drop("_n")
    )


def rolling_range_agg(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    range_seconds: float,
    value_col: str,
    aggs: Sequence[str] = ("count", "sum"),
    suffix: str | None = None,
) -> DataFrame:
    """Per-entity rolling aggregates over a TIME-RANGE frame
    ``[ts - range_seconds, ts]`` — the frame shape ROWS frames cannot express
    when events are irregular (a "rolling 7-day count" must follow event time,
    not row position). One window spec ⇒ one shuffle for every aggregate.

    ``sum`` accumulates in decimal(18,6) and casts to double AFTER the sum:
    decimal addition is associative/exact, so the result is bit-identical
    across partitionings and engines (float summation order is not).

    Output columns: ``n_{suffix}`` for count, ``{agg}_{suffix}`` otherwise
    (suffix defaults to ``{range_seconds}s``).
    """
    if range_seconds != int(range_seconds) or range_seconds <= 0:
        # rangeBetween takes integral offsets; -int(0.5) would silently build
        # a 0-width frame — reject instead of mis-aggregating
        raise ValueError(f"range_seconds must be a positive whole number, got {range_seconds}")
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(_epoch_seconds(F.col(ts_col)))
        .rangeBetween(-int(range_seconds), 0)
    )
    sfx = suffix or f"{int(range_seconds)}s"
    exprs = {
        "count": lambda: F.count(F.lit(1)).over(w),
        # .over() binds to the aggregate itself; the double cast comes after
        "sum": lambda: F.sum(F.col(value_col).cast("decimal(18,6)")).over(w).cast("double"),
        "avg": lambda: F.avg(value_col).over(w),
        "min": lambda: F.min(value_col).over(w),
        "max": lambda: F.max(value_col).over(w),
    }
    out = df
    for a in aggs:
        if a not in exprs:
            raise ValueError(f"agg must be one of {sorted(exprs)}, got {a!r}")
        name = f"n_{sfx}" if a == "count" else f"{a}_{sfx}"
        out = out.withColumn(name, exprs[a]())
    return out


def percentile_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95),
    names: Sequence[str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Exact interpolated quantiles per group (A3 breadth): Spark
    ``percentile`` shares DuckDB ``quantile_cont``'s interpolation definition,
    so the result is oracle-checkable. Exact percentiles need the full sorted
    group (one shuffle); at 100 TB prefer ``approx_percentile`` unless the
    audit needs exactness — this operator IS the audit path.
    """
    if names is None:
        names = [f"p{int(p * 100)}_{value_col}" for p in percentiles]
    aggs = [
        F.expr(f"percentile({value_col}, {p})").alias(n)
        for p, n in zip(percentiles, names)
    ]
    return df.groupBy(*group_cols).agg(*aggs, F.count(F.lit(1)).alias(count_col))


def tumbling_window_agg(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    window_duration: str,
    aggs: Sequence[Column],
    slide_duration: str | None = None,
) -> DataFrame:
    """Event-time tumbling/sliding window aggregation via ``F.window``.

    Spark-native form of the reference's strided framing
    (``/root/reference/models/vggish/vggish_src/mel_features.py:21-45``; the
    0.96 s/0.96 s example framing at ``vggish_params.py:34-35`` is literally a
    tumbling event-time window). groupBy ⇒ partial aggregation map-side, one
    shuffle on (entity, window).
    """
    win = F.window(ts_col, window_duration, slide_duration or window_duration)
    return (
        df.groupBy(*entity_cols, win.alias("win"))
        .agg(*aggs)
        .withColumn("win_start", F.col("win.start"))
        .withColumn("win_end", F.col("win.end"))
        .drop("win")
    )
