"""Similarity search over embedding columns: brute-force cosine top-k (the
exact baseline) and hyperplane-LSH bucketed ANN (the 10^12-row scale path).

The reference's closest analog is CLIP's zero-shot image×text matmul
(``/root/reference/models/clip/extract_clip.py:86-108``) — a dense all-pairs
similarity; here generalized to keyed top-k retrieval. Pure DataFrame: dot
products via ``zip_with``/``aggregate`` (JVM, codegen), ranking via window
top-k. Queries are broadcast (small side); the corpus never moves except the
one shuffle the window ranking needs — and in the LSH variant, candidates are
co-partitioned by bucket so even that shuffle shrinks to bucket-local work.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _l2(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for every query vector (brute force). Queries are
    broadcast; corpus scans once. Output (query_id, vec_id, cos, rank)."""
    c = corpus.select(F.col(id_col), F.col(emb_col).alias("__ce"), _l2(emb_col).alias("__cn"))
    q = queries.select(
        F.col(query_id_col), F.col(emb_col).alias("__qe"), _l2(emb_col).alias("__qn")
    )
    sims = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        id_col,
        (_dot("__ce", "__qe") / (F.col("__cn") * F.col("__qn"))).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _planes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32).tolist()


def hyperplane_buckets(
    df: DataFrame,
    emb_col: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 7,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(emb · plane_i). Planes are
    seeded literals baked into the plan — deterministic across engines/runs.
    Cosine-similar vectors collide with probability (1 - θ/π)^n_planes."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(
            _dot(F.col(emb_col), lit_plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return df.withColumn(out_col, sig)


def _multi_table_buckets(df: DataFrame, emb_col: str, dim: int, n_planes: int,
                         n_tables: int, seed: int) -> DataFrame:
    """Adds exploded (lsh_table, lsh_bucket) rows — one per hash table. A
    vector appears n_tables times; candidates are any same-(table, bucket)
    collision. Recall = 1 − (1 − p)^L for per-table collision prob p."""
    buckets = []
    out = df
    for t in range(n_tables):
        out = hyperplane_buckets(out, emb_col, dim, n_planes, seed + 1009 * t, out_col=f"__b{t}")
        buckets.append(F.struct(F.lit(t).alias("lsh_table"), F.col(f"__b{t}").alias("lsh_bucket")))
    out = out.withColumn("__tb", F.explode(F.array(*buckets)))
    return out.select(
        *[c for c in df.columns], F.col("__tb.lsh_table").alias("lsh_table"),
        F.col("__tb.lsh_bucket").alias("lsh_bucket"),
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket both sides in ``n_tables``
    independent hash tables, rank only within colliding buckets. Recall < 1 by
    construction (tests measure it vs the exact baseline); cost drops from
    O(|corpus|·|queries|) to bucket-local work. Tune n_planes↑ for selectivity
    (bigger corpora), n_tables↑ for recall — the standard LSH trade."""
    c = _multi_table_buckets(corpus.select(id_col, emb_col), emb_col, dim, n_planes, n_tables, seed)
    c = c.select(id_col, F.col(emb_col).alias("__ce"), _l2(emb_col).alias("__cn"),
                 "lsh_table", "lsh_bucket")
    q = _multi_table_buckets(queries.select(query_id_col, emb_col), emb_col, dim, n_planes, n_tables, seed)
    q = q.select(query_id_col, F.col(emb_col).alias("__qe"), _l2(emb_col).alias("__qn"),
                 "lsh_table", "lsh_bucket")
    cand = (
        c.join(F.broadcast(q), ["lsh_table", "lsh_bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, "__ce", "__cn", "__qe", "__qn")
        .dropDuplicates([query_id_col, id_col])
    )
    sims = cand.select(
        query_id_col, id_col,
        (_dot("__ce", "__qe") / (F.col("__cn") * F.col("__qn"))).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
