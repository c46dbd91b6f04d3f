"""Image codecs for the ``bytes`` column: pure-numpy PNG (real, lossless),
pure-numpy baseline JPEG (real, ``functions/jpeg.py``), and a deterministic
quantizing lossy codec ("qjpg") used as the fast stand-in in the synthetic
hot path.

Replaces the reference's cv2-based decode
(``/root/reference/utils/io.py:109-154``: ``cv2.VideoCapture`` → BGR frame →
``cv2.cvtColor(BGR2RGB)`` at ``io.py:131``) with zero native dependencies:
PNG implemented against the real spec (zlib + scanline filters — decodes any
8-bit non-interlaced PNG: grayscale/RGB/palette/gray+alpha/RGBA → RGB,
encodes filter-0 in all five colortypes); real ``.jpg`` payloads decode through the
T.81 decoder (baseline AND progressive, ``functions/jpeg.py``); QJPG is a
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


# channels per PNG colortype (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace pass grid (spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(
    arr: np.ndarray, palette: np.ndarray | None = None, interlace: bool = False
) -> bytes:
    """Minimal-but-real PNG encoder (filter type 0 per scanline).
    Colortype from shape: ``(h,w)`` → grayscale (0) — or palette (3) when
    ``palette`` (≤256×3 uint8) is given and ``arr`` holds indices;
    ``(h,w,2)`` → gray+alpha (4); ``(h,w,3)`` → RGB (2); ``(h,w,4)`` →
    RGBA (6). dtype uint16 writes bitdepth 16 (big-endian samples);
    ``interlace=True`` writes Adam7 (each pass its own filtered sub-image).
    Real scraped corpora carry all of these (the reference decodes them via
    cv2, ``utils/io.py:131``)."""
    if arr.dtype == np.uint16:
        arr, bitdepth = np.ascontiguousarray(arr), 16
    else:
        arr, bitdepth = np.ascontiguousarray(arr, dtype=np.uint8), 8
    if arr.ndim == 2:
        h, w = arr.shape
        channels, colortype = 1, (3 if palette is not None else 0)
        arr = arr[:, :, None]
    else:
        h, w, channels = arr.shape
        colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def scanlines(sub: np.ndarray) -> bytes:
        sh, sw = sub.shape[:2]
        if sh == 0 or sw == 0:
            return b""
        flat = (
            sub.astype(">u2").view(np.uint8).reshape(sh, sw * channels * 2)
            if bitdepth == 16
            else sub.reshape(sh, sw * channels)
        )
        return np.concatenate([np.zeros((sh, 1), np.uint8), flat], axis=1).tobytes()

    if interlace:
        raw = b"".join(
            scanlines(arr[y0::dy, x0::dx]) for x0, y0, dx, dy in _ADAM7
        )
    else:
        raw = scanlines(arr)
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, int(interlace))
    chunks = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if colortype == 3:
        assert bitdepth == 8, "palette PNGs are 8-bit in this encoder"
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        assert pal.ndim == 2 and pal.shape[1] == 3 and pal.shape[0] <= 256
        assert int(arr.max(initial=0)) < pal.shape[0], "palette index out of range"
        chunks += _chunk(b"PLTE", pal.tobytes())
    return chunks + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")


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


def _png_subimage(buf: bytes, pw: int, ph: int, channels: int, bitdepth: int) -> np.ndarray:
    """One filtered sub-image (the whole image, or one Adam7 pass) →
    (ph, pw, channels) uint8 samples. 16-bit takes the high byte (cv2/PIL
    8-bit conversion); sub-byte depths unpack MSB-first."""
    stride = (pw * channels * bitdepth + 7) // 8
    bpp = max(1, channels * bitdepth // 8)
    px = _unfilter(np.frombuffer(buf, np.uint8), ph, stride, bpp)
    if bitdepth == 8:
        return px[:, : pw * channels].reshape(ph, pw, channels)
    if bitdepth == 16:
        return px[:, : pw * channels * 2 : 2].reshape(ph, pw, channels)
    # 1/2/4-bit (gray or palette ⇒ channels == 1): MSB-first within each byte
    bits = np.unpackbits(px, axis=1)[:, : pw * bitdepth]
    weights = 1 << np.arange(bitdepth - 1, -1, -1)
    vals = (bits.reshape(ph, pw, bitdepth) * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :, None]


def decode_png(data: bytes) -> np.ndarray:
    """Decode any PNG — colortypes 0 (grayscale), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA); bitdepths 1/2/4/8/16; Adam7 interlaced or not —
    to uint8 H×W×3 RGB, matching the reference's decode-anything cv2 path
    (``utils/io.py:131``): grayscale replicates to 3 channels (sub-byte
    depths scale to full range), palette indices resolve through PLTE,
    16-bit keeps the high byte, alpha is dropped (cv2 IMREAD_COLOR / PIL
    convert("RGB") behavior)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    idat = b""
    plte: "bytes | None" = None
    h = bitdepth = colortype = interlace = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    legal_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if colortype not in _PNG_CHANNELS or bitdepth not in legal_depths[colortype] \
            or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (bitdepth={bitdepth}, colortype={colortype}, "
            f"interlace={interlace})"
        )
    channels = _PNG_CHANNELS[colortype]
    from .jpeg import MAX_DECODE_PIXELS

    if not h or not w or h * w > MAX_DECODE_PIXELS:
        raise ValueError(f"corrupt PNG: implausible dimensions {w}x{h}")

    def nbytes(pw: int, ph: int) -> int:
        if not pw or not ph:
            return 0
        return ph * ((pw * channels * bitdepth + 7) // 8 + 1)

    passes = (
        [(x0, y0, dx, dy,
          (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
         for x0, y0, dx, dy in _ADAM7]
        if interlace
        else [(0, 0, 1, 1, w, h)]
    )
    # decompress EXACTLY the pixel-data size the header implies (+1 to detect
    # excess): an uncapped zlib.decompress would hand an adversarial deflate
    # bomb unbounded memory before the reshape below ever catches it
    want = sum(nbytes(pw, ph) for *_, pw, ph in passes)
    dec = zlib.decompressobj()
    raw_bytes = dec.decompress(idat, want + 1)
    if len(raw_bytes) != want:
        raise ValueError("corrupt PNG: pixel data length mismatch")
    px = np.zeros((h, w, channels), np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph in passes:
        n = nbytes(pw, ph)
        if n:
            px[y0::dy, x0::dx] = _png_subimage(
                raw_bytes[off : off + n], pw, ph, channels, bitdepth
            )
            off += n
    if colortype == 2:
        return px
    if colortype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if colortype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("corrupt PNG: palette image without a valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("corrupt PNG: palette index out of range")
        return pal[idx]
    # colortypes 0 / 4: replicate luma (sub-byte scaled to full range),
    # drop alpha if present
    gray = px[:, :, :1]
    if bitdepth < 8:
        gray = gray * np.uint8(255 // ((1 << bitdepth) - 1))
    return np.repeat(gray, 3, axis=2)


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
        # pure-numpy JPEG fallback (functions/jpeg.py, baseline + progressive)
        # — slower than PIL but dependency-free
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
