"""Bucketed feature tables: the shuffle-free co-location primitive at 100 TB.

The reference has no storage-layout story at all (a flat output directory per
model, ``/root/reference/models/_base/base_extractor.py:129-147``); at cluster
scale the dominant cost of a features⨝labels or probes⨝features join is the
shuffle of the big side. Writing both sides bucketed by the join key with the
same bucket count lets Spark's bucketed-scan distribution satisfy the join's
(and window's) required hash distribution directly — the physical plan carries
NO Exchange on the bucketed side (asserted in ``tests/test_bucketed.py``).

Pattern at 10^12 rows: bucket the feature store by entity key once at write
time (one shuffle, amortized over every downstream read); every subsequent
as-of join, window pass, or equi-join on that key is exchange-free. Bucket
count should be a multiple of target parallelism and sized so a bucket fits
an executor (~128-512 MB of features per bucket).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted) parquet
    table. ``sort_cols`` matters for as-of/window consumers: bucket + in-bucket
    sort by (key, ts) means the window pass needs neither exchange nor a full
    sort of cold data. ``path`` makes it an external table (tests point this
    at a tmp dir; production points at the warehouse/object store)."""
    # one file per bucket: without this, EVERY input task writes its own file
    # per bucket it touches (tasks × buckets small files — guide §6), and a
    # single-split input writes all buckets from one task, serially. Hash
    # distribution by the bucket key matches the bucket assignment, so each
    # task holds whole buckets and the write parallelism is num_buckets.
    df = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read back a bucketed table. The bucket spec rides in the catalog, so
    the scan reports a hash distribution Catalyst can use to elide exchanges
    (requires ``spark.sql.sources.bucketing.enabled``, on by default)."""
    return spark.table(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
