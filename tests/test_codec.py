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


def _encode_png_filtered(arr: np.ndarray, ftype_of_row) -> bytes:
    """Spec-correct PNG encoder applying filters 1-4 per scanline — foreign
    encoders emit these; our own encoder only writes filter 0."""
    import struct
    import zlib

    from video_features_spark.functions.codec import _PNG_SIG, _chunk

    arr = arr.astype(np.int32)
    h, w, _ = arr.shape
    bpp, stride = 3, w * 3
    flat = arr.reshape(h, stride)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = ftype_of_row(y)
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        out.append(ft)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decodes_foreign_filters(ftype):
    """The decoder's general unfilter path (filters 1-4, PNG spec §9) —
    exercised per filter type and with mixed per-row filters."""
    img = _img(ftype, 23, 17)
    data = _encode_png_filtered(img, lambda y: ftype)
    assert (decode_png(data) == img).all()


def test_png_decodes_mixed_filters():
    img = _img(9, 40, 31)
    data = _encode_png_filtered(img, lambda y: y % 5)
    assert (decode_png(data) == img).all()


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


def test_batched_preprocess_bit_equals_per_image():
    """clip_preprocess_batch must match the per-image path EXACTLY — any GEMM
    accumulation-order divergence would break determinism across batch splits."""
    from video_features_spark.functions.preprocess import clip_preprocess_batch

    for h, w in [(64, 96), (96, 64), (20, 20), (32, 48)]:
        imgs = [_img(s, h, w) for s in range(5)]
        batched = clip_preprocess_batch(np.stack(imgs), 32)
        for i, im in enumerate(imgs):
            single = clip_preprocess(im, 32)
            assert np.array_equal(batched[i], single), f"size {(h, w)} row {i} diverged"


def test_preprocess_deterministic():
    img = _img(11, 64, 48)
    a, b = clip_preprocess(img, 32), clip_preprocess(img, 32)
    assert (a == b).all()


def test_resize_constant_image_preserved():
    img = np.full((50, 70, 3), 137, np.uint8)
    r = resize(img, 32)
    assert np.allclose(r, 137.0, atol=1e-3)  # kernel rows sum to 1
