"""Image codecs for the ``bytes`` column: pure-numpy PNG (real, lossless),
pure-numpy baseline JPEG (real, ``functions/jpeg.py``), and a deterministic
quantizing lossy codec ("qjpg") used as the fast stand-in in the synthetic
hot path.

Replaces the reference's cv2-based decode
(``/root/reference/utils/io.py:109-154``: ``cv2.VideoCapture`` → BGR frame →
``cv2.cvtColor(BGR2RGB)`` at ``io.py:131``) with zero native dependencies:
PNG implemented against the real spec (zlib + scanline filters — decodes any
8-bit RGB PNG, encodes filter-0); real ``.jpg`` payloads decode through the
baseline T.81 decoder (progressive raises with a clear hint); QJPG is a
clearly-marked deterministic stand-in (PSNR ≈ 46 dB) kept for the synthetic
benchmark corpus because a Python Huffman loop in the 400k-image hot path
would measure the codec, not the engine. When PIL is present (real
deployments) it is preferred automatically for both PNG and JPEG.

All functions operate on ``uint8 H×W×3`` RGB arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJP1"
QJPG_STEP = 4  # quantization step → max per-pixel error 2 → PSNR ≈ 46 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal-but-real RGB8 PNG encoder (filter type 0 per scanline)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (spec §9); needed to decode arbitrary
    8-bit RGB PNGs, not just our own filter-0 output."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if not ftypes.any():  # all filter-0 (our own encoder's output): pure slice
        return np.ascontiguousarray(rows[:, 1:])
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        ftype, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need left-to-right recurrence
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    idat = b""
    h = bitdepth = colortype = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, colortype = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if bitdepth != 8 or colortype != 2:
        raise ValueError(f"unsupported PNG (bitdepth={bitdepth}, colortype={colortype})")
    from .jpeg import MAX_DECODE_PIXELS

    if not h or not w or h * w > MAX_DECODE_PIXELS:
        raise ValueError(f"corrupt PNG: implausible dimensions {w}x{h}")
    # decompress EXACTLY the pixel-data size the header implies (+1 to detect
    # excess): an uncapped zlib.decompress would hand an adversarial deflate
    # bomb unbounded memory before the reshape below ever catches it
    want = h * (w * 3 + 1)
    dec = zlib.decompressobj()
    raw_bytes = dec.decompress(idat, want + 1)
    if len(raw_bytes) != want:
        raise ValueError("corrupt PNG: pixel data length mismatch")
    raw = np.frombuffer(raw_bytes, np.uint8)
    return _unfilter(raw, h, w * 3, 3).reshape(h, w, 3)


def encode_qjpg(arr: np.ndarray, step: int = QJPG_STEP) -> bytes:
    """Deterministic lossy stand-in for JPEG (no real JPEG codec in container):
    mid-rise quantization by ``step`` + zlib. NOT a JPEG — a clearly-marked fake
    with the property the tests need: bounded reconstruction error (PSNR≈46 dB)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    q = (arr // step).astype(np.uint8)
    return _QJPG_MAGIC + struct.pack(">IIB", w, h, step) + zlib.compress(q.tobytes(), 6)


def decode_qjpg(data: bytes) -> np.ndarray:
    assert data[:4] == _QJPG_MAGIC, "not a qjpg"
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.int32) * step + step // 2, 255).astype(np.uint8)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """``png`` → real PNG; ``jpeg``/``jpg`` → real baseline JPEG (pure numpy,
    functions/jpeg.py); ``qjpg`` → the deterministic stand-in, opt-in by its
    own token only — both JPEG spellings must produce actual JPEG bytes, never
    silently-incompatible fake payloads."""
    if fmt == "png":
        return encode_png(arr)
    if fmt in ("jpeg", "jpg"):
        from .jpeg import encode_jpeg

        return encode_jpeg(arr, quality=97)
    if fmt == "qjpg":
        return encode_qjpg(arr)
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode an image payload to uint8 H×W×3 RGB. Sniffs the container magic;
    ``fmt`` is advisory. Uses PIL when available (real deployments)."""
    if data[:8] == _PNG_SIG:
        if _HAS_PIL:  # pragma: no cover
            import io

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return decode_png(data)
    if data[:4] == _QJPG_MAGIC:
        return decode_qjpg(data)
    if _HAS_PIL:  # pragma: no cover - preferred for real JPEG (fast C path)
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    if data[:2] == b"\xff\xd8":
        # pure-numpy baseline JPEG fallback (functions/jpeg.py) — slower than
        # PIL but dependency-free; progressive streams raise with a clear hint
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise NotImplementedError(
        f"no codec for payload (fmt={fmt!r}): not PNG/QJPG/JPEG"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; the input_hint's lossy-decode invariant
    is PSNR ≥ 40 dB."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
