"""Parquet table loaders for the driver-generated TPC-H-ish test schema.

Spark-side analog of the reference's path-list source
(``/root/reference/utils/utils.py:135-175`` — CLI list / txt file → work list):
the "work list" is a table, discovery/pruning is the scan's job, and the
reference's manual input shuffling for load balancing is subsumed by Spark task
scheduling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def has_iceberg(spark: SparkSession) -> bool:
    """True when an Iceberg runtime is on the classpath (production clusters);
    this sandbox ships none, so the snapshot source falls back to parquet."""
    try:
        # py4j package attributes resolve lazily — Class.forName is the real probe
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def read_snapshot(
    spark: SparkSession, table: str, snapshot_id: int | str | None = None
) -> DataFrame:
    """Snapshot-pinned table read — the north rule's "reads Iceberg snapshots".

    With Iceberg on the classpath: a time-travel read of exactly
    ``snapshot_id`` (reproducible input set, the id recorded in checkpoint
    manifests). Without it (this sandbox): a plain parquet read — the
    directory IS the immutable snapshot here, and ``snapshot_id`` is carried
    through ``checkpointed_write(..., snapshot_id=...)`` lineage rows so the
    resume/verify contract is identical either way.
    """
    if has_iceberg(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            sid = str(snapshot_id)
            # numeric → a snapshot id; anything else → a named tag/branch
            reader = reader.option("snapshot-id" if sid.isdigit() else "tag", sid)
        return reader.load(table)
    return spark.read.parquet(table)
