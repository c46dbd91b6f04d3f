"""Dedup + similarity operator gates: exact-Jaccard vs DuckDB, MinHash-LSH
recall vs exact, SimHash hamming on injected near-dups, ANN recall vs
brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.utils import assert_frames_match
from video_features_spark.operators.dedup import (
    embedding_near_dup,
    hamming64_col,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    simhash_signatures,
)
from video_features_spark.operators.similarity import cosine_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """documents + 5 injected near-duplicates (id + 100000)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" extra token")).alias("text"),
    )
    df = docs.unionByName(dups).cache()
    df.count()
    return df


def test_jaccard_pairs_vs_duckdb(spark, duck, sf_dir):
    res = jaccard_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text", n=5, threshold=0.5
    )
    oracle = duck.execute(
        """
        WITH sh AS (
          SELECT DISTINCT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT AS h
          FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, greatest(length(text)-4, 1)+1),
                  i -> substr(text, i::INT, 5)))) AS s FROM documents)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
        """
    ).df()
    assert_frames_match(res.toPandas(), oracle)


def test_minhash_lsh_recall(corpus):
    """LSH-verified near-dup pairs must recover every exact-Jaccard pair at
    the threshold (32 hashes / 8 bands → band match prob ~1 at j≥0.7)."""
    exact = {(r["id_a"], r["id_b"]) for r in
             jaccard_pairs(corpus, "doc_id", "text", 5, threshold=0.7).collect()}
    assert len(exact) >= 5  # the injected dups are found at all
    got = {(r["id_a"], r["id_b"]) for r in
           minhash_dedup(corpus, "doc_id", "text", 32, 8, 5, threshold=0.7).collect()}
    assert exact <= got | exact and len(got & exact) / len(exact) >= 0.95
    # verification step keeps precision exact: no pair below threshold
    assert got <= {(r["id_a"], r["id_b"]) for r in
                   jaccard_pairs(corpus, "doc_id", "text", 5, threshold=0.7).collect()}


def test_minhash_signature_stable_across_partitionings(corpus):
    a = minhash_signatures(corpus.repartition(1), "doc_id", "text", 16, 5)
    b = minhash_signatures(corpus.repartition(16), "doc_id", "text", 16, 5)
    pa = {r["doc_id"]: r["minhash"] for r in a.collect()}
    pb = {r["doc_id"]: r["minhash"] for r in b.collect()}
    assert pa == pb


def test_lsh_candidates_contain_injected_dups(corpus):
    sigs = minhash_signatures(corpus, "doc_id", "text", 32, 5)
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, "doc_id", 8).collect()}
    for i in range(5):
        pair = tuple(sorted([i, i + 100000]))
        assert pair in cands, f"injected dup {pair} missed by LSH"


def test_simhash_near_vs_far(corpus):
    sh = simhash_signatures(corpus, "doc_id", "text")
    joined = sh.alias("x").join(
        sh.alias("y"), F.col("x.doc_id") + 100000 == F.col("y.doc_id")
    ).select(hamming64_col(F.col("x.simhash"), F.col("y.simhash")).alias("ham"))
    near = [r["ham"] for r in joined.collect()]
    assert len(near) == 5 and max(near) <= 8
    far = sh.alias("x").join(
        sh.alias("y"),
        (F.col("x.doc_id") + 1 == F.col("y.doc_id")) & (F.col("x.doc_id") % 97 == 3),
    ).select(hamming64_col(F.col("x.simhash"), F.col("y.simhash")).alias("ham"))
    fars = [r["ham"] for r in far.collect()]
    assert fars and np.mean(fars) > 10  # unrelated docs differ in many bits


def test_embedding_near_dup_finds_planted(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + 9000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    pairs = embedding_near_dup(emb.select("vec_id", "embedding").unionByName(planted),
                               "vec_id", threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(0, 9000), (1, 9001), (2, 9002)} <= got


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 10").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in
              lsh_ann_topk(emb, q, k=5, dim=64, n_planes=2, n_tables=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall {recall} collapsed"
    # every approx result is a genuine corpus/query pair with correct ranking ≤ 5
    assert all(qid != vid for qid, vid in approx)


def test_connected_components_chain_and_clique(spark):
    from video_features_spark.operators.dedup import connected_components, dedup_groups

    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # clique {10,11,12}, isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    kept = {r["id"] for r in dedup_groups(pairs).filter("is_kept").collect()}
    assert kept == {1, 10, 20}


def test_connected_components_auto_evaluates_chain_once(spark):
    """The auto probe must not re-evaluate the (usually expensive) upstream
    pair chain when the graph is over the driver cap: the probe collects from
    a localCheckpoint and the star path reuses the same materialization.
    Counted with an accumulator in the chain, both sides of the cap."""
    from pyspark.sql import functions as F

    from video_features_spark.operators.dedup import connected_components

    for cap in (1, 500_000):  # over-cap -> star path; under-cap -> union-find
        acc = spark.sparkContext.accumulator(0)

        @F.udf("long")
        def traced(x):
            acc.add(1)
            return x

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        ).select(traced("id_a").alias("id_a"), F.col("id_b"))
        comp = {
            r["id"]: r["component"]
            for r in connected_components(pairs, max_local_pairs=cap).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        assert acc.value == 3, (
            f"pair chain evaluated {acc.value / 3:.0f}x at cap={cap} "
            "(must be exactly once)"
        )


def test_ivf_ann_recall_and_exactness_at_full_probe(spark, sf_dir):
    from video_features_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 10").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in
              ivf_ann_topk(emb, q, k=5, n_centroids=16, nprobe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall} collapsed"
    # probing every cell must reproduce the exact result (IVF → brute force)
    full = {(r["query_id"], r["vec_id"]) for r in
            ivf_ann_topk(emb, q, k=5, n_centroids=8, nprobe=8).collect()}
    assert full == exact


def test_minhash_dedup_jaccard_values_are_exact(corpus):
    """The candidate-restricted verifier must return the same jaccard VALUES
    as the full exact computation for every verified pair."""
    verified = minhash_dedup(corpus, "doc_id", "text", 32, 8, 5, threshold=0.7)
    exact = jaccard_pairs(corpus, "doc_id", "text", 5, threshold=0.7)
    j = verified.join(
        exact.withColumnRenamed("jaccard", "jaccard_exact"), ["id_a", "id_b"], "left"
    )
    assert j.filter(F.col("jaccard_exact").isNull()).count() == 0  # precision exact
    assert j.filter(F.abs(F.col("jaccard") - F.col("jaccard_exact")) > 1e-12).count() == 0


def test_embedding_near_dup_blocked_matches_planted_and_plan(spark, sf_dir):
    """Blocked near-dup finds the planted dups, is a subset of brute force,
    and its physical plan contains NO nested-loop join over the corpus."""
    from video_features_spark.operators.dedup import embedding_near_dup_blocked

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + 9000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    df = emb.select("vec_id", "embedding").unionByName(planted)
    blocked = embedding_near_dup_blocked(df, "vec_id", dim=64, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in blocked.collect()}
    assert {(0, 9000), (1, 9001), (2, 9002)} <= got
    brute = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup(df, "vec_id", threshold=0.999).collect()}
    assert got <= brute  # verify step keeps precision exact
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_ivf_centroid_fit_no_global_sort(spark, sf_dir):
    """The centroid sample must compile to TakeOrderedAndProject (per-partition
    top-k), not a full Sort+Exchange of the corpus."""
    from video_features_spark.operators.similarity import ivf_fit_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sampled = (
        emb.select(F.xxhash64("vec_id").alias("__h"), F.col("embedding"))
        .orderBy("__h")
        .limit(64)
    )
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # determinism across partitionings
    a = ivf_fit_centroids(emb.repartition(2), n_centroids=8, sample_size=128)
    b = ivf_fit_centroids(emb.repartition(13), n_centroids=8, sample_size=128)
    assert (a == b).all()


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_cc_star_handles_adversarial_chain(spark):
    """The round-4 hardening gate: an adversarial duplicate CHAIN needs
    O(length) rounds under min-label propagation but only O(log²) under the
    large-star/small-star default — star must be exact on a 120-chain within
    12 rounds, where label propagation provably is not (the reason the
    default changed)."""
    from video_features_spark.operators.dedup import connected_components

    n = 120
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    star = {
        r["id"]: r["component"]
        for r in connected_components(pairs, max_iter=12, algorithm="star").collect()
    }
    assert star == {i: 0 for i in range(n)}
    label = {
        r["id"]: r["component"]
        for r in connected_components(pairs, max_iter=12, algorithm="label").collect()
    }
    assert label != star  # diameter-bound: 12 rounds can't traverse 120 hops


from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    n_edges = draw(st.integers(min_value=1, max_value=32))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(n_edges)
    ]
    return [e for e in edges if e[0] != e[1]] or [(0, 1)]


@given(edges=_graphs())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_cc_star_equals_label_equals_union_find(spark, edges):
    """Hypothesis gate: on random graphs (self-loop-free, duplicate edges
    legal, both orientations legal) the star and label algorithms agree with
    a pure-Python union-find ground truth."""
    from video_features_spark.operators.dedup import connected_components

    nodes = sorted({x for e in edges for x in e})
    want = _union_find(nodes, edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {
        r["id"]: r["component"]
        for r in connected_components(pairs, algorithm="star").collect()
    }
    label = {
        r["id"]: r["component"]
        for r in connected_components(pairs, algorithm="label", max_iter=100).collect()
    }
    auto = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert star == want
    assert label == want
    assert auto == want  # driver-side union-find path (under-cap graphs)
    # force the auto probe OVER the cap: must fall through to star, same answer
    big_path = {
        r["id"]: r["component"]
        for r in connected_components(pairs, max_local_pairs=0).collect()
    }
    assert big_path == want


def test_cc_star_refuses_unconverged_output(spark):
    """Exhausting max_iter before the star forest forms must raise, never
    silently emit multi-parent rows (wrong dedup groups)."""
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    from video_features_spark.operators.dedup import connected_components

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1, algorithm="star").collect()


def test_jaccard_on_pairs_keeps_zero_shingle_docs(spark):
    """ADVICE r03: a candidate pair whose doc is SHORTER than shingle_n has
    no shingle/size rows — with threshold=0.0 it must still appear, at
    jaccard 0.0 (incl. the empty-∪-empty 0/0 case)."""
    from video_features_spark.operators.dedup import jaccard_on_pairs, shingle_table

    docs = spark.createDataFrame(
        [("a", "tiny"), ("b", "this one is long enough to shingle"), ("c", "x")],
        "doc_id string, text string",
    )
    sh = shingle_table(docs, "doc_id", "text", 5)
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "id_a string, id_b string"
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in jaccard_on_pairs(sh, pairs, "doc_id", threshold=0.0).collect()}
    assert got == {("a", "b"): 0.0, ("a", "c"): 0.0}


def test_jaccard_on_pair_sets_matches_exploded_verifier(spark):
    """The set-based verify (minhash_dedup's hot path) must agree with the
    exploded-table verifier on every pair, both join strategies, including
    zero-overlap and sub-shingle-length docs."""
    from video_features_spark.operators.dedup import (
        jaccard_on_pair_sets,
        jaccard_on_pairs,
        shingle_table,
    )

    docs = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy cat"),
            ("c", "completely unrelated text with no shared shingles!"),
            ("d", "the quick brown fox jumps over the lazy dog"),  # == a
            ("e", "xy"),  # shorter than shingle_n
            ("f", None),  # NULL text
            ("g", None),  # NULL text: f-g must be 0.0, never NULL==NULL 1.0
        ],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"), ("f", "g"), ("a", "f")],
        "id_a string, id_b string",
    )
    sh = shingle_table(docs, "doc_id", "text", 5)
    exploded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_on_pairs(sh, pairs, "doc_id", threshold=0.0).collect()
    }
    for bc in (True, False):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_on_pair_sets(
                docs, pairs, "doc_id", "text", 5, threshold=0.0, broadcast_pairs=bc
            ).collect()
        }
        assert set(got) == set(exploded)
        for k in got:
            assert abs(got[k] - exploded[k]) < 1e-12, (bc, k, got[k], exploded[k])
    assert exploded[("a", "d")] == 1.0  # identical docs
    assert exploded[("a", "c")] == 0.0  # zero overlap survives at threshold 0
    assert exploded[("f", "g")] == 0.0  # NULL-text pair: both verifiers 0.0


def test_inrow_signatures_match_exploded_aggregate(spark):
    """minhash_signatures' in-row array_min form must be bit-identical to the
    explode+groupBy aggregate it replaced (min over the same distinct set)."""
    from pyspark.sql import functions as F

    from video_features_spark.operators.dedup import (
        _P,
        _hash_params,
        minhash_signatures,
        shingle_table,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some repeated shingle text {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    n_hashes = 16
    sh = shingle_table(docs, "doc_id", "text", 5)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(_hash_params(n_hashes))
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    old = {r["doc_id"]: [r[f"m{i}"] for i in range(n_hashes)] for r in agg.collect()}
    new = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures(docs, "doc_id", "text", n_hashes, 5).collect()
    }
    assert new == old
