"""Text-analysis operators over document/caption columns — all pure JVM
(whole-stage codegen; no Python in the hot path), each with an ANSI-SQL
oracle twin in ``__spark_entry__.oracle_sql``.

The reference's only text ops are the CLIP tokenizer cleanup + BPE
(``/root/reference/models/clip/clip_src/simple_tokenizer.py``); these operators
are the training-data-pipeline extensions the task brief names: language-ID
(char-n-gram heuristic), quality scoring, token counting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Compact per-language char-trigram profiles (high-frequency trigrams of each
# language, public linguistic knowledge). Deliberately small: the operator's
# job is the *plan shape* (distinct-trigram extraction + set intersection per
# candidate language); swap richer profiles in production.
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "he ", " th", "ing", "and", "nd ", " an", "ng ", " of", "of ",
           "ed ", " to", "to ", "er ", " in", "on ", " a ", "at ", "is ", " is"),
    "es": ("de ", " de", "la ", " la", "os ", "el ", " el", " co", "es ", " es",
           "as ", "ón ", "ión", " en", "en ", "ue ", " qu", "que", "nte", " se"),
    "fr": (" de", "de ", "es ", "le ", " le", "ent", "nt ", " la", "la ", "et ",
           " et", "ion", " pa", "re ", " co", "que", " qu", "ue ", "ur ", " un"),
}


def char_trigrams(text_col: str) -> Column:
    """Distinct lowercase char trigrams of a string column, extracted JVM-side:
    transform over an index sequence (no UDF, no explode-shuffle)."""
    t = f"lower({text_col})"
    # guard: sequence(1, 0) DESCENDS in Spark, so short texts need the branch
    return F.expr(
        f"if(length({t}) < 3, array(),"
        f" array_distinct(transform(sequence(1, length({t}) - 2),"
        f" i -> substring({t}, i, 3))))"
    )


def langid_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Char-trigram language ID: per language, the fraction of the document's
    distinct trigrams found in that language's profile; ``lang_pred`` is the
    argmax (ties broken by language-name order, deterministic). Emits
    ``(id, ngram_<lang>... , lang_pred)``."""
    from .dedup import _spread_scan

    profiles = profiles or TRIGRAM_PROFILES
    # single-split inputs would run the per-character trigram extraction on
    # one task (see dedup._spread_scan)
    df = _spread_scan(df, id_col)
    grams = char_trigrams(text_col).alias("__g")
    base = df.select(id_col, grams)
    scores = [
        (
            F.size(F.array_intersect("__g", F.array(*[F.lit(g) for g in prof])))
            / F.greatest(F.size("__g"), F.lit(1))
        ).alias(f"ngram_{lang}")
        for lang, prof in sorted(profiles.items())
    ]
    scored = base.select(id_col, *scores)
    langs = sorted(profiles)
    best = F.greatest(*[F.col(f"ngram_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earliest language wins ties
        pred = F.when(F.col(f"ngram_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    lang: str | None = "en",
    jaccard_threshold: float = 0.5,
    shingle_n: int = 5,
    dedup_strategy: str = "lsh",
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """End-to-end corpus curation — the composition a training-data pipeline
    actually runs: quality gate → language gate → near-dup cluster collapse
    (keep the smallest id of each connected component). Every stage is a
    DataFrame operator defined elsewhere in this package; the whole thing is
    one logical plan Catalyst optimizes jointly (the quality/lang filters
    prune rows *before* the near-dup stage).

    ``dedup_strategy``: ``"lsh"`` (default, the 100 TB path — MinHash→LSH
    banding→candidate-only verify; 64 hashes / 16 bands = 4 rows per band,
    the r=4 selectivity that keeps moderate-similarity pairs out of the
    candidate set with ~99% recall at jaccard ≥ 0.7) or ``"exact"``
    (full-pair Jaccard — O(Σ freq²) shingle self-join, the
    oracle-twin/small-corpus path).

    Emits (id, lang_pred, quality, n_words) for surviving documents.
    """
    from .dedup import _spread_scan, dedup_groups, jaccard_pairs, minhash_dedup

    df = _spread_scan(df, id_col)
    q = quality_score(df, text_col, id_col).select(id_col, "quality", "n_words")
    l = langid_ngram(df, text_col, id_col).select(id_col, "lang_pred")
    # localCheckpoint the SCORED table before the gates: (a) filtering on a
    # computed column pushes a rewritten predicate below the scan, inlining
    # the trigram/quality expressions up to 12x per row into a single-task
    # Filter (measured: the dominant cost of this operator at sf0.1); (b) the
    # near-dup stage below re-evaluates `kept` four times (candidate probe,
    # both verify sides, the final survivor join). One materialization of the
    # scored corpus replaces all of that — the same lineage-cut discipline
    # connected_components already uses. At 100 TB the checkpoint is one
    # corpus-sized materialization traded against >=4 recomputations of the
    # scan + scoring chain.
    scored = df.join(q, id_col).join(l, id_col).localCheckpoint()
    kept = scored.filter(F.col("quality") >= min_quality)
    if lang is not None:
        kept = kept.filter(F.col("lang_pred") == lang)
    if dedup_strategy == "lsh":
        pairs = minhash_dedup(
            kept, id_col, text_col,
            n_hashes=n_hashes, bands=bands, shingle_n=shingle_n,
            threshold=jaccard_threshold,
        )
    elif dedup_strategy == "exact":
        pairs = jaccard_pairs(kept, id_col, text_col, n=shingle_n, threshold=jaccard_threshold)
    else:
        raise ValueError(f"dedup_strategy must be lsh|exact, got {dedup_strategy!r}")
    groups = dedup_groups(pairs).withColumnRenamed("id", id_col)
    return (
        kept.join(groups.select(id_col, "is_kept"), id_col, "left")
        .filter(F.col("is_kept").isNull() | F.col("is_kept"))  # singletons survive
        .select(id_col, "lang_pred", "quality", "n_words")
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite document-quality heuristics (all JVM): length, word count,
    mean word length, punctuation ratio, uppercase ratio, and a 0..1 composite
    that penalizes degenerate documents (too short, all-punct, shouting)."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_chars = F.length(t)
    n_words = F.size(words)
    punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    mean_wlen = (n_chars.cast("double") / F.greatest(n_words, F.lit(1)))
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1))
    upper_ratio = upper.cast("double") / F.greatest(n_chars, F.lit(1))
    composite = (
        F.least(n_words.cast("double") / F.lit(20.0), F.lit(1.0))
        * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
        * (F.lit(1.0) - F.least(upper_ratio * 4, F.lit(1.0)))
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
        composite.alias("quality"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Document fingerprinting by winnowing (the MOSS algorithm, Schleimer/
    Wilkerson/Aiken 2003): hash every k-gram position, slide a window of
    ``w`` consecutive position-hashes, keep each window's minimum — the
    selected set is a compact, position-robust fingerprint guaranteed to
    share a hash with any copy of length ≥ w+k-1. Pure JVM (higher-order
    functions over an index sequence, no UDF, no explode until the final
    distinct set), md5-prefix hashes ⇒ DuckDB reproduces the fingerprint set
    exactly. Emits exploded ``(id, fingerprint)`` rows.

    At corpus scale the fingerprint table is the substrate for copy
    detection: group by fingerprint, pairs sharing ≥ t fingerprints are
    plagiarism/near-copy candidates — same join shape as the shingle
    verifier, ~1/w the rows."""
    from .dedup import _spread_scan, shingle_hash

    df = _spread_scan(df, id_col)
    t = F.col(text_col)
    pos = F.sequence(F.lit(1), F.greatest(F.length(t) - k + 1, F.lit(1)))
    hashes = F.transform(pos, lambda i: shingle_hash(t.substr(i, F.lit(k))))
    # materialize the position-hash array in its OWN projection: embedded
    # inline in the window lambda below it is re-evaluated per window
    # position (HOF lambdas re-run their whole body per element — O(L·w)
    # md5 calls per doc became O(L²) in practice and dominated the query).
    base = df.select(id_col, hashes.alias("__ph"))
    n_win = F.greatest(F.size("__ph") - w + 1, F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_min(F.slice("__ph", i, w)),
    )
    return base.select(
        id_col, F.explode(F.array_distinct(wins)).alias("fingerprint")
    )
