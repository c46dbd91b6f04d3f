"""Codec + preprocess + phash unit invariants (input_hint contract: exact PNG
roundtrip, PSNR ≥ 40 dB lossy, deterministic preprocessing)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from video_features_spark.functions.codec import (
    decode_image,
    decode_png,
    decode_qjpg,
    encode_image,
    encode_png,
    encode_qjpg,
    psnr,
)
from video_features_spark.functions.phash import average_hash, hamming64
from video_features_spark.functions.preprocess import center_crop, clip_preprocess, resize


def _img(seed=0, h=64, w=64):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    for seed, (h, w) in enumerate([(32, 32), (101, 97), (48, 64), (1, 1)]):
        img = _img(seed, h, w)
        assert (decode_png(encode_png(img)) == img).all()


def test_qjpg_psnr_invariant():
    for seed in range(5):
        img = _img(seed, 101, 97)
        assert psnr(img, decode_qjpg(encode_qjpg(img))) >= 40.0


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    h=st.integers(1, 80),
    w=st.integers(1, 80),
)
def test_codec_roundtrip_property(seed, h, w):
    img = _img(seed, h, w)
    assert (decode_image(encode_image(img, "png")) == img).all()
    assert psnr(img, decode_image(encode_image(img, "jpeg"))) >= 40.0


def test_decode_sniffs_magic():
    img = _img(1)
    assert (decode_image(encode_png(img), fmt="jpeg") == img).all()  # fmt advisory
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_phash_near_dup_collides_far_differs():
    base = _img(7, 64, 64)
    noisy = np.clip(
        base.astype(np.int16) + np.random.default_rng(8).integers(-3, 4, base.shape), 0, 255
    ).astype(np.uint8)
    other = _img(99, 64, 64)
    assert hamming64(average_hash(base), average_hash(noisy)) <= 10
    assert hamming64(average_hash(base), average_hash(other)) > 10


def test_resize_and_crop_shapes():
    img = _img(3, 101, 97)
    r = resize(img, 32, smaller_edge=True)
    assert min(r.shape[:2]) == 32 and r.shape[0] > r.shape[1]  # aspect preserved
    c = center_crop(r, 32)
    assert c.shape == (32, 32, 3)
    out = clip_preprocess(img, 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32


def test_preprocess_deterministic():
    img = _img(11, 64, 48)
    a, b = clip_preprocess(img, 32), clip_preprocess(img, 32)
    assert (a == b).all()


def test_resize_constant_image_preserved():
    img = np.full((50, 70, 3), 137, np.uint8)
    r = resize(img, 32)
    assert np.allclose(r, 137.0, atol=1e-3)  # kernel rows sum to 1
