"""BPE tokenizer gates: algorithm invariants (merge greediness, framing,
round-trip) + the Spark operator. Mirrors the contracts of the reference
tokenizer (/root/reference/models/clip/clip_src/simple_tokenizer.py:62-127 and
clip_src/clip.py:200-240) without its vocabulary file."""

import numpy as np
import pytest

from video_features_spark.functions.bpe import (
    CONTEXT_LENGTH,
    EOT,
    SOT,
    _bpe_word,
    _encoder,
    _merges,
    bytes_to_unicode,
    encode,
    tokenize,
    vocab_size,
)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256  # bijective


def test_merge_table_deterministic_and_nonempty():
    m1 = dict(_merges())
    _merges.cache_clear()
    m2 = dict(_merges())
    assert m1 == m2 and len(m1) >= 100
    # ranks are a permutation of 0..n-1
    assert sorted(m1.values()) == list(range(len(m1)))


def test_common_word_merges_to_single_token():
    # high-frequency training words collapse fully
    assert _bpe_word("the") == ("the</w>",)
    assert _bpe_word("photo") == ("photo</w>",)


def test_unknown_word_splits_but_encodes():
    ids = encode("zyxwvut")  # never seen in training
    assert len(ids) >= 2  # falls back toward characters
    assert all(i > 0 for i in ids)


def test_framing_contract():
    enc = _encoder()
    rows = tokenize(["a photo of a cat", None, ""])
    for row in rows:
        assert len(row) == CONTEXT_LENGTH
        assert row[0] == enc[SOT]
        body = [t for t in row if t != 0]
        assert body[-1] == enc[EOT]
    assert rows[1] == rows[2]  # null ≡ empty string


def test_truncation_keeps_eot():
    enc = _encoder()
    long = "cat " * 200
    row = tokenize([long], truncate=True)[0]
    assert len(row) == CONTEXT_LENGTH and row[-1] == enc[EOT]
    with pytest.raises(ValueError):
        tokenize([long], truncate=False)


def test_ids_in_vocab_range():
    rows = tokenize(["children playing on the beach &amp; dog"])
    arr = np.array(rows)
    assert arr.min() >= 0 and arr.max() < vocab_size()


def test_spark_operator_matches_local(spark):
    from video_features_spark.operators.features import caption_bpe_tokenize

    caps = ["a photo of a cat", "sunset over the lake", None, "naïve café 🌊"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(caps)], "id int, caption string")
    got = {r["id"]: r["token_ids"] for r in caption_bpe_tokenize(df).collect()}
    ref = tokenize(caps)
    for i, c in enumerate(caps):
        assert got[i] == ref[i], f"row {i} mismatch"
