"""Deduplication operators for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash, and embedding-cosine near-dup.

No analog exists in the reference (its only uniqueness machinery is the
duplicate-stem assertion, ``/root/reference/utils/utils.py:91-92``); these are
the scale-path operators a 100 TB corpus needs. Everything is pure DataFrame
API — shingling via higher-order functions, hashing via ``md5``-prefix ints
(chosen deliberately: DuckDB computes the identical value, so every stage up to
LSH banding is oracle-checkable in SQL) — so Catalyst handles pushdown and AQE
handles skew in the self-joins.

Scale notes
-----------
- Shingle explosion multiplies rows by ~doc_len; the candidate self-join is on
  the *banded signature* (MinHash) — k·n rows, band cardinality keeps buckets
  small. Never on raw shingles except in ``jaccard_pairs`` (the exact verifier,
  used on LSH candidates or small corpora).
- Stop-shingle removal (``max_shingle_freq``) bounds the hottest buckets the
  same way stop-words bound an inverted index; without it one common shingle
  creates an O(n²) bucket.
- All signatures are integers; a 10^12-row dedup shuffles fixed-width columns,
  not text.
- The shingle scan+explode is deliberately RECOMPUTED per consumer (sigs,
  sizes, verify a-side/b-side) rather than persisted: Catalyst's aggregate
  merging leaves no identical exchanges for ReuseExchange, and caching the
  exploded table is a losing trade — it is ~16 bytes per text character
  (larger than the corpus itself), while each recompute is a bandwidth-bound
  scan + codegen'd higher-order functions. Measured at sf0.1: the persisted
  variant is SLOWER (8.6 s vs 7.8 s warm); at 100 TB the cache would also
  have to spill hundreds of TB. If a deployment has a cheap columnar cache
  tier, persist the DISTINCT (id, h) output of ``shingle_table`` externally
  (e.g. write it bucketed by id via ``sources.bucketed``) and feed the
  downstream stages from that table instead.
- The minhash_dedup VERIFY avoids the exploded table altogether
  (``jaccard_on_pair_sets``): per-doc shingle-hash sets are computed in-row
  and pairs intersect via ``array_intersect`` — no Σ_pairs|A| row explosion,
  no reassembly groupBy (measured 2× the exploded verify at sf0.1, identical
  output). ``jaccard_on_pairs`` keeps the exploded-table form for callers
  with a pre-built or stop-shingle-filtered table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _spread_scan(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Lift scan parallelism when the input arrives in fewer partitions than
    the session can use (guide §2.5 "input skew": a single-row-group parquet
    file scans as ONE task, serializing every per-row transform above it —
    the driver testdata tables are exactly that shape). Hash-repartition on
    ``key_col`` (deterministic, no sort-before-repartition pass; Murmur3 over
    thousands of distinct ids spreads evenly). No-op when the input is
    already parallel (the 100 TB case — real corpora arrive in thousands of
    splits) or streaming, so this never adds a shuffle at scale; locally it
    trades one tiny exchange for 32-way parallelism of the md5/shingle work.
    The target is the session's scheduling parallelism, not a constant."""
    if df.isStreaming:
        return df
    try:
        # probe ONLY scan-shaped plans: on a plan containing shuffles (joins,
        # aggregates, repartitions) `.rdd` forces AQE to EXECUTE the upstream
        # stages as a throwaway job — and such plans are already parallel
        # anyway. Plan inspection is planning-time only, no execution.
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        nodes = {
            ln.split("'")[0].strip("+-: ").split(" ")[0]
            for ln in plan.splitlines()
            if ln.strip()
        }
        if not nodes <= {"Project", "Filter", "Relation", "LogicalRDD", "MapInPandas"}:
            return df
        target = df.sparkSession.sparkContext.defaultParallelism
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - parallelism probe must never break a plan
        return df
    if nparts >= target:
        return df
    return df.repartition(target, key_col) if key_col else df.repartition(target)

# 2^32 < P (prime); md5-prefix hashes are < 2^32, so (a*h + b) % P is
# collision-structured like a universal hash family
_P = 4294967311
_A_SEED = 0x9E3779B1


def _hash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family. ``a`` is kept
    under 2^20 so a·h + b stays below 2^52 — ANSI-mode int64 safe in both Spark
    and the DuckDB oracle (h is an md5-prefix < 2^32)."""
    params = []
    a, b = _A_SEED, 0x85EBCA77
    for _ in range(n_hashes):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (b * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        params.append((a % 1048573 + 1, b % _P))
    return params


def char_shingles(text_col, n: int = 5):
    """Distinct character n-grams of a string column (higher-order functions,
    no UDF): positions 1..len-n+1 → substrings → array_distinct."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))


def shingle_hash(shingle_col):
    """32-bit integer hash of a shingle via md5 prefix — identical in DuckDB
    (``('0x'||substr(md5(s),1,8))::BIGINT``), which keeps MinHash oracle-able."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 8), 16, 10).cast("long")


def exact_dedup(df: DataFrame, key_cols, tiebreak_col: str) -> DataFrame:
    """Exact dedup: one surviving row per key (min tiebreak), plus group size."""
    return df.groupBy(*key_cols).agg(
        F.min(tiebreak_col).alias(f"keep_{tiebreak_col}"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, max_shingle_freq: int | None = None
) -> DataFrame:
    """(id, shingle_hash h) exploded table; optionally drops stop-shingles
    occurring in more than ``max_shingle_freq`` docs (bounds join fan-out)."""
    sh = (
        df.select(id_col, F.explode(char_shingles(text_col, n)).alias("__sh"))
        .select(id_col, shingle_hash(F.col("__sh")).alias("h"))
        .distinct()
    )
    if max_shingle_freq:
        hot = (
            sh.groupBy("h").agg(F.count(F.lit(1)).alias("__f"))
            .filter(F.col("__f") > max_shingle_freq)
            .select("h")
        )
        sh = sh.join(F.broadcast(hot), "h", "left_anti")
    return sh


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.7,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle:
    |A∩B| via shingle self-join, |A∪B| = |A|+|B|−|A∩B|. Output
    (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold."""
    df = _spread_scan(df, id_col)
    sh = shingle_table(df, id_col, text_col, n, max_shingle_freq)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "h")
    b = sh.select(F.col(id_col).alias("id_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _sig_min_expr(a: int, b: int):
    # separate factory: a lambda with bound default args would read as 3-arg
    # to PySpark's higher-order-function arity inspection
    return F.array_min(F.transform("__sset", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_P)))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 32, shingle_n: int = 5
) -> DataFrame:
    """(id, minhash array<long>[n_hashes]) — min over shingles of
    (a_i·h + b_i) mod P per hash function, computed IN-ROW over the doc's
    shingle-hash set (``array_min`` ∘ ``transform`` per hash function): the
    whole signature stage is map-only inside whole-stage codegen — no shingle
    explode, no 50M-row groupBy shuffle (measured 5-7× the exploded
    aggregate at sf0.1, bit-identical values — min over the same distinct
    set commutes with how the set is laid out)."""
    sets = shingle_sets(df, id_col, text_col, shingle_n)
    return sets.select(
        id_col,
        F.array(*[_sig_min_expr(a, b) for a, b in _hash_params(n_hashes)]).alias("minhash"),
    )


def band_hash_expr(sig_col: str, band: int, rows_per_band):
    """Band hash = md5-prefix of the band's signature values joined with ','
    plus a band marker — engine-neutral (DuckDB computes the identical value:
    ``('0x'||substr(md5(concat_ws(',', m_i, ..., 'b<band>')),1,8))::BIGINT``),
    which makes the whole LSH chain oracle-checkable in SQL."""
    start = F.lit(band) * rows_per_band + 1
    vals = F.transform(
        F.slice(F.col(sig_col), start, rows_per_band), lambda x: x.cast("string")
    )
    return shingle_hash(F.concat_ws(",", vals, F.lit(f"b{band}")))


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, bands: int = 8, sig_col: str = "minhash"
) -> DataFrame:
    """Band the signature, hash each band, self-join on (band, band_hash):
    classic MinHash-LSH candidate generation. Signature length must be
    divisible by ``bands``.

    The input is re-exchanged on the id first: in-row signatures arrive as an
    UNMATERIALIZED projection, and without a barrier Catalyst's projection
    collapse inlines the whole signature computation (shingle set + one
    transform per hash function) into EVERY band-hash expression on BOTH
    sides of the self-join — measured 2x the total chain at sf0.1. The
    exchange carries only (id, n_hashes longs) — trivial at any scale — and
    the two join sides share it via ReuseExchange, so the signature pipeline
    evaluates exactly once."""
    sig_df = sig_df.repartition(id_col)
    rows_per_band = (F.size(F.col(sig_col)) / bands).cast("int")
    banded = sig_df.select(
        id_col,
        F.posexplode(
            F.array(*[band_hash_expr(sig_col, b, rows_per_band) for b in range(bands)])
        ).alias("band", "band_hash"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _resolve_candidate_pairs(
    pairs: DataFrame, max_broadcast_pairs: int
) -> tuple[DataFrame, bool]:
    """Shared auto broadcast-vs-shuffle decision: a bounded
    ``limit(cap+1).collect()`` probe (CollectLimit stops early — a candidate
    explosion never fully materializes driver-side). When the probe returns
    ≤ cap rows it returned EVERY candidate (deterministic full set), so the
    chain is replaced by a driver-local table: the broadcast and every later
    reference reuse it at zero recompute. Returns (pairs, broadcast?)."""
    # Arrow transfer (toPandas) instead of a Row-object collect: the probe
    # moves up to cap+1 rows to the driver, and columnar Arrow is ~10x the
    # row-pickle path for a 100k+-pair candidate set (guide §6 "Arrow for
    # driver transfers"); localizing back via createDataFrame(pandas) rides
    # Arrow too. Same rows, same bounded-probe semantics.
    head = pairs.limit(max_broadcast_pairs + 1).toPandas()
    if len(head) > max_broadcast_pairs:
        return pairs, False
    local = pairs.sparkSession.createDataFrame(head, schema=pairs.schema)
    return local, True


def _shingle_set_expr(text_col: str, n: int):
    """In-row DISTINCT shingle-hash set of a text column. NULL hashes (NULL
    text ⇒ one NULL shingle ⇒ NULL md5) are FILTERED: ``array_intersect``
    treats NULL as equal-to-NULL, so keeping them would score two NULL-text
    docs as jaccard 1.0 where the exploded verifier's equi-join (NULL never
    equals NULL) scores 0.0 — the set form must match it."""
    return F.array_distinct(
        F.filter(
            F.transform(char_shingles(text_col, n), shingle_hash),
            lambda h: h.isNotNull(),
        )
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, __sset array<long>) — each doc's DISTINCT shingle-hash set computed
    IN-ROW (higher-order functions, no explode, no shuffle). Same set the
    exploded ``shingle_table`` yields per id, as one map-only pass (modulo
    NULL hashes, which the exploded equi-joins can never match anyway — see
    ``_shingle_set_expr``)."""
    return df.select(id_col, _shingle_set_expr(text_col, n).alias("__sset"))


def jaccard_on_pair_sets(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.0,
    broadcast_pairs: bool = False,
    prefilter_ids: bool | None = None,
) -> DataFrame:
    """Exact Jaccard over a candidate pair list via per-doc shingle SETS:
    join each pair to its two in-row shingle-hash arrays, then
    ``array_intersect`` — the minhash_dedup verify hot path.

    Why sets beat the exploded-table join (measured 2× at sf0.1): the
    exploded verify multiplies shingle rows by pair membership
    (Σ_pairs |A| intermediate rows) and pays a giant groupBy to re-assemble
    intersections; here the data moved is the same Σ_pairs(|A|+|B|) hash
    values but as a few wide rows per pair — no row explosion, no aggregate,
    and the per-pair intersect runs inside whole-stage codegen. At 100 TB the
    joins shuffle on the id columns (or stream past a broadcast pair list)
    and nothing fans out: a hot shingle cannot blow up a pair-anchored join
    (hot-shingle fan-out only matters for candidate GENERATION, which LSH
    banding already bounds). Every pair id exists in ``df`` by construction
    (candidates are drawn from it), and zero-overlap pairs surface naturally
    with jaccard 0 — no re-anchor join needed."""
    if prefilter_ids is None:
        # NOT broadcast_pairs: broadcast only vouches for SMALLNESS, while
        # the prefilter references `pairs` two more times — on a lazy
        # candidate chain (the usual external input) that re-executes the
        # whole signature+banding+self-join pipeline per reference. Only
        # callers holding a LOCALIZED pair table (minhash_dedup after its
        # bounded probe) should opt in.
        prefilter_ids = False
    base_a = base_b = df
    if prefilter_ids:
        # pairs are a small LOCAL table here (the caller vouches — each
        # semi-join below references them twice more, which would re-evaluate
        # a lazy candidate chain) — pre-filter each side's docs to the ids
        # that actually appear in candidates (broadcast semi-join sits BELOW
        # the set projection, so non-candidate rows never pay the
        # per-character shingle transform; on a sparse-candidate corpus this
        # prunes most of the work)
        base_a = df.join(
            F.broadcast(pairs.select(F.col("id_a").alias(id_col)).distinct()), id_col, "semi"
        )
        base_b = df.join(
            F.broadcast(pairs.select(F.col("id_b").alias(id_col)).distinct()), id_col, "semi"
        )
    # the set table is narrow in Catalyst's stats (estimated from the source
    # parquet) but WIDE in reality (one hash per text character) — without the
    # hint the planner happily broadcasts hundreds of real MB of arrays
    # (measured: 23 s vs 4 s at sf0.1). Shuffle-hash keeps wide rows out of
    # driver memory and skips the sort a merge join would pay on them.
    a = (
        shingle_sets(base_a, id_col, text_col, n)
        .select(F.col(id_col).alias("id_a"), F.col("__sset").alias("__sa"))
        .hint("shuffle_hash")
    )
    b = (
        shingle_sets(base_b, id_col, text_col, n)
        .select(F.col(id_col).alias("id_b"), F.col("__sset").alias("__sb"))
        .hint("shuffle_hash")
    )
    cand = F.broadcast(pairs) if broadcast_pairs else pairs
    # two-step projection so the O(|A|+|B|) array_intersect runs ONCE per
    # pair: inlined into the jaccard expression it is evaluated three times
    # (tie condition, numerator, denominator) — HOF/collection expressions
    # are CodegenFallback, so codegen subexpression elimination never merges
    # them. Aliasing intersect/size in their own projection makes the
    # references attribute reads (same arithmetic, same values).
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sa", "__sb")).alias("__i"),
            (F.size("__sa") + F.size("__sb")).alias("__sz"),
        )
    )
    union_sz = F.col("__sz") - F.col("__i")
    return (
        scored.select(
            "id_a",
            "id_b",
            F.when(union_sz == 0, F.lit(0.0))
            .otherwise(F.col("__i") / union_sz)
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_on_pairs(
    sh: DataFrame, pairs: DataFrame, id_col: str, threshold: float = 0.0,
    broadcast_pairs: bool | None = None,
    max_broadcast_pairs: int = 500_000,
) -> DataFrame:
    """Exact Jaccard restricted to a given candidate pair list — the verifier
    LSH exists to feed. Only candidate pairs' shingles are joined: the pair
    list broadcasts into the shingle table (post-LSH candidate sets are small
    relative to the corpus), so the cost is O(candidates × shingles-per-doc),
    never the full-corpus shingle self-join.

    ``broadcast_pairs=None`` (default) decides automatically: a bounded probe
    (``pairs.limit(max_broadcast_pairs + 1).collect()`` — CollectLimit stops
    early, it never materializes a huge candidate set) picks broadcast for
    ≤ ``max_broadcast_pairs`` candidates and a shuffle join on id_a above it,
    so a loose banding config can no longer OOM an executor-memory broadcast.
    In the broadcast case the probe's rows ARE the full candidate set, so they
    are localized into a driver-side table and the candidate chain is never
    evaluated again (the r4 probe re-ran the chain for the broadcast AND the
    re-anchor join — ~1.5 s/query at sf0.1 paid twice); the collected set is
    ≤ cap+1 small fixed-width rows, bounded by construction. Pass True/False
    to force a side.

    ``sh`` is a ``shingle_table`` output; ``pairs`` has (id_a, id_b)."""
    if broadcast_pairs is None:
        pairs, broadcast_pairs = _resolve_candidate_pairs(pairs, max_broadcast_pairs)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sha = sh.select(F.col(id_col).alias("id_a"), "h")
    shb = sh.select(F.col(id_col).alias("id_b"), "h")
    cand = F.broadcast(pairs) if broadcast_pairs else pairs
    inter = (
        sha.join(cand, "id_a")
        .join(shb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # candidate pairs sharing ZERO shingles vanish from the inner join above;
    # re-anchor on the full pair list so they come back as jaccard = 0.0 —
    # with the threshold=0.0 default the output must cover every input pair
    inter = pairs.join(inter, ["id_a", "id_b"], "left").withColumn(
        "inter", F.coalesce(F.col("inter"), F.lit(0))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    # docs with ZERO shingles (text shorter than shingle_n) have no sizes row
    # — LEFT joins + coalesce keep their pairs too, and an empty-∪-empty pair
    # is jaccard 0.0 by convention (guards the 0/0 division)
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        inter.join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .withColumn("sz_a", F.coalesce(F.col("sz_a"), F.lit(0)))
        .withColumn("sz_b", F.coalesce(F.col("sz_b"), F.lit(0)))
        .select(
            "id_a",
            "id_b",
            F.when(union_sz == 0, F.lit(0.0))
            .otherwise(F.col("inter") / union_sz)
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.7,
    broadcast_pairs: bool | None = None,
) -> DataFrame:
    """Full near-dup pipeline: MinHash → LSH banding → candidate pairs →
    exact-Jaccard verification ≥ threshold, computed ONLY over the LSH
    candidates (the pruning is the whole point — verifying against a
    full-corpus Jaccard would re-introduce the O(n²) shingle self-join).
    ``broadcast_pairs=None`` auto-picks broadcast vs shuffle by a bounded
    candidate probe (``_resolve_candidate_pairs`` — an under-cap set is
    localized so the candidate chain never re-evaluates). Verification runs
    through the SET-based verifier (``jaccard_on_pair_sets``, measured 2×
    the exploded join at sf0.1); the exploded-table verifier
    (``jaccard_on_pairs``) remains for callers that bring a pre-built or
    stop-shingle-filtered shingle table. Returns verified
    (id_a, id_b, jaccard) pairs."""
    # single-split inputs (one-row-group parquet) would otherwise run the
    # whole signature AND verify-side set computation on one task
    df = _spread_scan(df, id_col)
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, bands)
    localized = False
    if broadcast_pairs is None:
        cands, broadcast_pairs = _resolve_candidate_pairs(cands, 500_000)
        localized = broadcast_pairs
    elif broadcast_pairs:
        # caller vouches for smallness; still try to localize so the chain
        # evaluates once — over the cap we honor the broadcast but skip the
        # id pre-filter (it would re-evaluate the lazy chain twice)
        local, ok = _resolve_candidate_pairs(cands, 500_000)
        if ok:
            cands, localized = local, True
    return jaccard_on_pair_sets(
        df, cands, id_col, text_col, shingle_n, threshold, broadcast_pairs,
        prefilter_ids=localized,
    )


def near_dup_join(
    left: DataFrame,
    right: DataFrame,
    id_left: str = "doc_id",
    id_right: str = "corpus_id",
    text_left: str = "text",
    text_right: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.7,
    left_extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Near-dup LOOKUP of ``left`` documents against a ``right`` corpus:
    MinHash-LSH banding on BOTH sides, candidate = collision in any band,
    exact set-Jaccard verification — the incremental form of
    ``minhash_dedup`` (new data vs an indexed corpus instead of corpus vs
    itself). Emits (id_left, [left_extra_cols], id_right, jaccard ≥
    threshold).

    STREAMING-LEGAL on the left side, which is the point: every left-side
    step is map-only (the r5 in-row signatures are what makes this possible —
    the classic explode+groupBy signature form is an aggregation a stream
    cannot run without windowed state), the candidate join is a plain
    stream-static equi-join on (band, band_hash), and verification is an
    in-row ``array_intersect`` of shingle sets recomputed from the carried
    texts. Batch callers get band-duplicate matches collapsed here; a
    streaming left must collapse them with
    ``dropDuplicatesWithinWatermark`` (see
    ``streaming.ops.stream_near_dup_lookup``) because stateless dedup is
    unbounded on a stream.

    Scale notes: the banded index of ``right`` is bands×|corpus| narrow rows
    — build it once and reuse across micro-batches/runs; texts ride the
    banded rows so the verify needs no second join (bounded ×bands
    recompute of a candidate's shingle sets, traded against re-joining a
    stream to itself, which Structured Streaming forbids)."""
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must evenly divide n_hashes ({n_hashes})")
    rpb = n_hashes // bands

    def banded_side(df, id_col, text_col, out_id, out_txt, extra=()):
        sets = df.select(
            F.col(id_col).alias(out_id),
            F.col(text_col).alias(out_txt),
            *[F.col(c) for c in extra],
            _shingle_set_expr(text_col, shingle_n).alias("__sset"),
        )
        sig = sets.select(
            out_id, out_txt, *extra,
            F.array(*[_sig_min_expr(a, b) for a, b in _hash_params(n_hashes)]).alias("__mh"),
        )
        # exchange barrier: without it projection collapse inlines the whole
        # signature computation into every band expression (see
        # lsh_candidate_pairs); repartition is streaming-legal
        sig = sig.repartition(out_id)
        return sig.select(
            out_id, out_txt, *extra,
            F.posexplode(
                F.array(*[band_hash_expr("__mh", b, rpb) for b in range(bands)])
            ).alias("band", "band_hash"),
        )

    lb = banded_side(left, id_left, text_left, "__lid", "__ltxt", tuple(left_extra_cols))
    rb = banded_side(right, id_right, text_right, "__rid", "__rtxt")
    cand = lb.join(rb, ["band", "band_hash"])
    # stage the shingle sets, then the intersect size, then the score: inlined
    # into one expression the per-character set computation and the intersect
    # are each re-evaluated for every reference (3x for the intersect — HOFs
    # are CodegenFallback, no subexpression elimination). Same values.
    staged = cand.select(
        F.col("__lid").alias(id_left),
        *[F.col(c) for c in left_extra_cols],
        F.col("__rid").alias(id_right),
        _shingle_set_expr("__ltxt", shingle_n).alias("__sl"),
        _shingle_set_expr("__rtxt", shingle_n).alias("__sr"),
    ).select(
        id_left,
        *left_extra_cols,
        id_right,
        F.size(F.array_intersect("__sl", "__sr")).alias("__i"),
        (F.size("__sl") + F.size("__sr")).alias("__sz"),
    )
    union_sz = F.col("__sz") - F.col("__i")
    out = (
        staged.select(
            id_left,
            *left_extra_cols,
            id_right,
            F.when(union_sz == 0, F.lit(0.0))
            .otherwise(F.col("__i") / union_sz)
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if left.isStreaming:
        return out  # caller collapses band duplicates within its watermark
    return out.dropDuplicates([id_left, id_right])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    algorithm: str = "auto",
    max_local_pairs: int = 500_000,
) -> DataFrame:
    """Connected components over near-dup pairs → ``(id, component)`` with
    component = the smallest member id.

    ``algorithm='auto'`` (default): a bounded probe
    (``limit(max_local_pairs+1).collect()``) sizes the edge list. An
    under-cap graph — the COMMON case: the input is the LSH-VERIFIED pair
    set, already pruned to actual near-dups — solves driver-side by
    union-find (exact, sub-second; the cap matches the broadcast probe's.
    Honest memory math: 500k collected Rows cost ~100+ bytes each plus a
    ≤1M-entry parent dict — order 100-200 MB transient driver memory, the
    same bounded-collect discipline as the IVF fit sample, NOT the raw 16
    bytes/pair), replacing ~K rounds × ~4 Spark jobs of pure scheduling
    overhead with one job. An over-cap graph falls through to the
    distributed star path. The probe runs over a ``localCheckpoint`` of the
    pair chain, so the chain evaluates exactly ONCE whichever path wins
    (probing the raw chain would re-evaluate it in the star path's own
    edge materialization).

    ``algorithm='star'``: alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — converges in O(log² n) rounds on ANY graph shape; THE scale
    path. ``algorithm='label'``: iterative min-label propagation —
    O(component diameter) rounds; fine for shallow near-dup clusters but an
    adversarial duplicate CHAIN makes the round count linear in chain
    length. All paths are gated equivalent (tests/test_dedup.py).

    Scale notes (star): every step is a join/groupBy keyed on node id —
    neighbor lists are never materialized (hot star centers stay
    aggregate-shaped; AQE skew-join applies); ``localCheckpoint`` truncates
    the lineage every round — without it the plan doubles per iteration and
    the driver chokes long before the data does. This is the step that turns
    verified pairs into dedup groups (keep min(id) per component)."""
    if algorithm == "auto":
        # Materialize the (usually lazy, usually expensive) pair chain ONCE
        # and probe the materialized set: probing the raw chain would make
        # the over-cap case evaluate it twice — once for this collect, again
        # when the star path materializes its own edges. An under-cap set is
        # <= cap rows so its checkpoint write is trivial; an over-cap set
        # needed materializing for the star rounds anyway. (Callers passing
        # an already-checkpointed table pay one redundant copy — bounded by
        # the data size, never by the chain.)
        local = pairs.select(id_a, id_b).localCheckpoint()
        head = local.limit(max_local_pairs + 1).collect()
        if len(head) <= max_local_pairs:
            return _cc_local_union_find(local, head, id_a, id_b)
        pairs = local
        algorithm = "star"
    if algorithm == "star":
        return _cc_alternating_stars(pairs, id_a, id_b, max_iter)
    if algorithm != "label":
        raise ValueError(f"algorithm must be auto|star|label, got {algorithm!r}")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("component", F.col("id"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        new = (
            labels.unionByName(nbr_min)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # cut lineage: iterative plans grow exponentially
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "__old"), "id")
            .filter(F.col("component") != F.col("__old"))
            .limit(1)
            .count()
        )
        labels = new
        if not changed:
            break
    return labels


def _cc_local_union_find(pairs: DataFrame, rows: list, id_a: str, id_b: str) -> DataFrame:
    """Driver-side union-find over an under-cap edge list (see
    ``connected_components(algorithm='auto')``). Union-by-min keeps each
    tree's root at the set minimum, so root == component label directly; full
    path compression makes the pass effectively linear."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    comp = [(x, find(x)) for x in parent]
    id_type = pairs.schema[id_a].dataType.simpleString()
    return pairs.sparkSession.createDataFrame(
        pd.DataFrame(comp, columns=["id", "component"]),
        schema=f"id {id_type}, component {id_type}",
    )


def _cc_alternating_stars(
    pairs: DataFrame, id_a: str, id_b: str, max_iter: int
) -> DataFrame:
    """See ``connected_components(algorithm='star')``. Each round:

    - large-star: every node's STRICTLY LARGER neighbors re-point to the
      minimum of its closed neighborhood → emitted edges always point
      larger→smaller.
    - small-star: every node and its (now all-smaller) neighbors re-point to
      the neighborhood minimum → components contract toward their root.

    Fixed point = a star forest: every edge is (member, root). Both stars are
    groupBy-min + join on the node id; the convergence probe is two LIMIT-1
    scans of the checkpointed round output."""
    # ONE materialization of the (possibly expensive) upstream pair chain;
    # nodes and working edges both derive from it
    raw = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        raw.select(F.col("src").alias("id"))
        .unionByName(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    edges = raw.filter(F.col("src") != F.col("dst"))

    def _not_star_forest(e: DataFrame) -> bool:
        """Fixed point ⟺ the edge set is a star forest: no parent is itself
        a child (no chains) and every child has exactly one parent."""
        chained = (
            e.join(e.select(F.col("dst").alias("src")).distinct(), "src", "semi")
            .limit(1)
            .count()
        )
        if chained:
            return True
        multi = e.groupBy("src").count().filter(F.col("count") > 1).limit(1).count()
        return multi > 0

    for rnd in range(max_iter):
        # large-star over the bidirected neighborhood
        bi = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = (
            bi.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select("src", F.least("__mn", F.col("src")).alias("__m"))
        )
        # no distinct/checkpoint here: duplicates collapse in the small-star
        # distinct below, and the two references to `ls` share their shuffle
        # (ReusedExchange) inside the ONE materialization per round
        ls = (
            bi.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        # small-star: edges now all point larger→smaller
        mn = ls.groupBy("src").agg(F.min("dst").alias("__m"))
        new = (
            ls.join(mn, "src")
            .filter(F.col("dst") != F.col("__m"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .unionByName(mn.select("src", F.col("__m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()  # cut lineage: iterative plans grow per round
        )
        edges = new
        # a non-trivial input is never star-shaped after round 0's large-star
        # alone — skip the probe there to save two jobs
        if rnd > 0 and not _not_star_forest(edges):
            break
    else:
        # max_iter exhausted without a probe success: verify once, and FAIL
        # LOUDLY if the forest didn't form — an unconverged edge set would
        # fan the final join out to multiple conflicting rows per node
        # (silently wrong dedup groups). O(log² n) convergence means hitting
        # this indicates a bug or an absurd max_iter, not a big graph.
        if _not_star_forest(edges):
            raise RuntimeError(
                f"connected_components(star) did not converge in {max_iter} "
                "rounds; raise max_iter or use algorithm='label'"
            )
    return nodes.join(
        edges.select(F.col("src").alias("id"), F.col("dst").alias("component")),
        "id",
        "left",
    ).select("id", F.coalesce("component", "id").alias("component"))


def dedup_groups(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", algorithm: str = "auto"
) -> DataFrame:
    """Pairs → one row per duplicate-cluster member: ``(id, component,
    is_kept)`` where the smallest id of each component is the survivor."""
    comp = connected_components(pairs, id_a, id_b, algorithm=algorithm)
    return comp.withColumn("is_kept", F.col("id") == F.col("component"))


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash: per-token hash (md5-prefix, 32 usable bits — the same
    engine-neutral hash as shingles, so DuckDB reproduces the signature
    bit-for-bit and the driver oracle-checks it), weighted bit-vote, sign →
    signature. Near-dup docs differ in few bits (compare with hamming64)."""
    if bits > 32:
        raise ValueError("md5-prefix hash provides 32 bits; bits must be <= 32")
    df = _spread_scan(df, id_col)
    toks = df.select(
        id_col,
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("__tok"),
    )
    weighted = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("w"))
    h = shingle_hash(F.col("__tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(-F.col("w"))
        ).alias(f"__v{i}")
        for i in range(bits)
    ]
    agg = weighted.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"__v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return agg.select(id_col, sig.alias("simhash"))


def hamming64_col(a, b):
    """Popcount of XOR for two long columns (bit_count is native in Spark)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)) if isinstance(a, str) else a.bitwiseXOR(b))


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    emb_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold).
    Brute-force O(n²) JVM-side — the exact verifier; for corpus scale, first
    block candidates with ``similarity.hyperplane_buckets`` and verify here."""
    norm = F.sqrt(F.aggregate(emb_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = df.select(F.col(id_col).alias("__id"), F.col(emb_col).alias("__e"), norm.alias("__n"))
    a = base.select(F.col("__id").alias("id_a"), F.col("__e").alias("e_a"), F.col("__n").alias("n_a"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__e").alias("e_b"), F.col("__n").alias("n_b"))
    dot = F.aggregate(F.zip_with("e_a", "e_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (dot / (F.col("n_a") * F.col("n_b"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dup_blocked(
    df: DataFrame,
    id_col: str,
    emb_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """The SCALE path for embedding near-dup: hyperplane-LSH blocking →
    bucket-local exact-cosine verify ≥ threshold. Candidates are pairs that
    collide in ANY of ``n_tables`` independent hash tables — the self-join runs
    on (table, bucket), never all-pairs, so the plan has no nested-loop join
    over the corpus (`embedding_near_dup` above stays as the exact/oracle
    twin). At cos ≥ 0.95 the per-table collision prob is ~0.66 with 4 planes;
    4 tables give ~99% recall. Planes are seeded literals, so the whole chain
    is deterministic AND SQL-reproducible (the driver oracle is generated from
    the same literals)."""
    from .similarity import _multi_table_buckets

    # single-split inputs would compute every table's plane dots on one task
    b = _multi_table_buckets(
        _spread_scan(df.select(id_col, emb_col), id_col), emb_col, dim, n_planes, n_tables, seed
    )
    norm = F.sqrt(F.aggregate(emb_col, F.lit(0.0), lambda acc, x: acc + x * x))
    b = b.select(
        F.col(id_col).alias("__id"), F.col(emb_col).alias("__e"), norm.alias("__n"),
        "lsh_table", "lsh_bucket",
    )
    a = b.select(
        F.col("__id").alias("id_a"), F.col("__e").alias("e_a"), F.col("__n").alias("n_a"),
        "lsh_table", "lsh_bucket",
    )
    c = b.select(
        F.col("__id").alias("id_b"), F.col("__e").alias("e_b"), F.col("__n").alias("n_b"),
        "lsh_table", "lsh_bucket",
    )
    # dedup BEFORE scoring: a pair colliding in k tables appears k times, and
    # scoring first would compute the dim-length dot fold k times per pair —
    # measured 2x slower than shuffling the vectors once into the dedup
    # (verified both orders at sf0.1; the exact-cosine fold dominates, not
    # the shuffle bytes, at these dims)
    cand = (
        a.join(c, ["lsh_table", "lsh_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "e_a", "n_a", "e_b", "n_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.aggregate(F.zip_with("e_a", "e_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        cand.select("id_a", "id_b", (dot / (F.col("n_a") * F.col("n_b"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
