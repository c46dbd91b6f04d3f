"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman).

Closes the no-PIL gap the reference never has (it shells out to cv2/ffmpeg,
``/root/reference/utils/io.py:109-154``): real-world ``.jpg`` payloads decode
here with zero native dependencies. Decoder handles baseline SOF0 (and SOF1)
streams: multi-table DQT/DHT, interleaved scans, chroma subsampling (any
h×v factors up to 2×2), restart markers, byte unstuffing, grayscale and
3-component YCbCr. The encoder is a minimal 4:4:4 baseline writer (Annex K
standard quantization + Huffman tables, libjpeg quality scaling) used for
roundtrip validation and as the real-``jpeg`` sink.

Implemented from the public spec (marker structure T.81 §B, Huffman decode
procedure §F.2.2, DCT Annex A, standard tables Annex K). Per-image cost is a
Python Huffman bit loop (~0.1 s for 224² — the documented fallback path; PIL
is auto-preferred by ``codec.decode_image`` when installed).
"""

from __future__ import annotations

import struct

import numpy as np

# Decode-side sanity cap on header-claimed dimensions. A corrupt/adversarial
# SOF claiming 65535x65535 would otherwise drive a multi-GB plane allocation
# per quarantined row BEFORE any entropy-data error surfaces — on a shared
# executor several such rows can OOM-kill the process instead of raising the
# Exception the per-row quarantine expects. 100 MP is far above any sane
# training image while keeping worst-case transient planes ~400 MB.
MAX_DECODE_PIXELS = 100_000_000

# zigzag scan order (T.81 Figure A.6): index i holds the raster position of
# the i-th zigzagged coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 standard quantization tables (luminance, chrominance)
STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_CHR_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1..16, values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II basis: FDCT F = C @ f @ C.T, IDCT f = C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


class _HuffTable:
    """Canonical Huffman decode via MINCODE/MAXCODE/VALPTR (T.81 §F.2.2.3)."""

    def __init__(self, bits: list[int], values: list[int]):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            self.maxcode[length] = code - 1 if bits[length - 1] else -1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = self.data[self.pos]
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            code = (code << 1) | self.read_bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: huffman code > 16 bits")
        return table.values[table.valptr[length] + code - table.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 §F.2.2.1: map the t magnitude bits to a signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 H×W×3 RGB (grayscale replicated)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class 0=DC/1=AC, id)
    restart_interval = 0
    frame = None
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline)
            h, w = struct.unpack(">HH", seg[1:5])
            if not h or not w or h * w > MAX_DECODE_PIXELS:
                raise ValueError(f"corrupt JPEG: implausible dimensions {w}x{h}")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0} (progressive?)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel.append({"cs": cs, "dc": tables >> 4, "ac": tables & 0xF})
            if frame is not None and ns < len(frame["comps"]):
                # legal under SOF0 (one SOS per component) but this decoder
                # handles only the interleaved single-scan layout — fail with
                # the same clear-hint style as the progressive case instead of
                # a KeyError deep inside the MCU loop
                raise ValueError(
                    f"non-interleaved baseline JPEG scans unsupported "
                    f"({ns} of {len(frame['comps'])} components in first SOS)"
                )
            scan_start = pos + seglen
            return _decode_scan(
                data, scan_start, frame, scan_sel, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("corrupt JPEG: no SOS marker")


def _entropy_segments(data: bytes, start: int) -> list[bytes]:
    """Split entropy data at restart markers, unstuffing FF00 → FF."""
    segs, cur = [], bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan (EOI etc.)
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs


def _decode_scan(data, start, frame, scan_sel, qt, huff, restart_interval):
    if frame is None:
        raise ValueError("corrupt JPEG: SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    sel = {s["cs"]: s for s in scan_sel}
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float32) for c in comps
    ]
    segs = _entropy_segments(data, start)
    reader = _BitReader(segs[0])
    seg_idx = 0
    dc_pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    dq = [qt[c["tq"]].astype(np.float32) for c in comps]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            dc_pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, comp in enumerate(comps):
            s = sel[comp["id"]]
            dct_t, act_t = huff[(0, s["dc"])], huff[(1, s["ac"])]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coef = np.zeros(64, np.float32)
                    t = reader.decode_huff(dct_t)
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    dc_pred[ci] += diff
                    coef[0] = dc_pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(act_t)
                        r, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        coef[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    # DQT tables arrive zigzag-ordered (like the coefficients):
                    # multiply positionally, then scatter to raster via ZIGZAG
                    block = np.zeros(64, np.float32)
                    block[ZIGZAG] = coef * dq[ci]
                    pix = _C.T @ block.reshape(8, 8) @ _C + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    # upsample each plane to full MCU-padded resolution, crop, color-convert
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal baseline encoder (4:4:4, Annex K tables, libjpeg quality scaling)
# ---------------------------------------------------------------------------


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        # pad to a byte boundary with 1-bits (T.81 §B.1.1.5)
        while self.nbits % 8:
            self.write(1, 1)


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 92, restart_interval: int = 0) -> bytes:
    """uint8 H×W×3 RGB → baseline JPEG bytes (4:4:4, standard tables).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every that
    many MCUs (resync points a splitting decoder can parallelize on)."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float32)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
    qly = _scaled_qt(STD_LUM_QT, quality)
    qlc = _scaled_qt(STD_CHR_QT, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, tbl in ((0, qly), (1, qlc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(tbl[z]) for z in ZIGZAG
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 1x1 sampling (4:4:4)
    for cls, tid, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHR), (1, 1, AC_CHR)
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes(
            [(cls << 4) | tid] + bits + vals
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tsel in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tsel])
    out += bytes([0, 63, 0])
    dc_codes = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHR)]
    ac_codes = [_huff_codes(*AC_LUM), _huff_codes(*AC_CHR)]
    wtr = _BitWriter()
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    planes = []
    for p in (y, cb, cr):
        pad = np.empty((ph, pw), np.float32)
        pad[:h, :w] = p
        pad[h:, :w] = p[h - 1 : h, :]
        pad[:, w:] = pad[:, w - 1 : w]
        planes.append(pad - 128.0)
    dc_pred = [0, 0, 0]
    n_mcux = pw // 8
    rst = 0
    for m in range(ph // 8 * n_mcux):
        my, mx = divmod(m, n_mcux)
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            dc_pred = [0, 0, 0]
        if True:
            for ci, p in enumerate(planes):
                tid = 0 if ci == 0 else 1
                qtab = qly if ci == 0 else qlc
                block = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                coefs = _C @ block @ _C.T
                q = np.round(coefs.reshape(64) / qtab.astype(np.float32)).astype(np.int64)
                zz = q[ZIGZAG]
                diff = int(zz[0]) - dc_pred[ci]
                dc_pred[ci] = int(zz[0])
                t = _category(diff)
                code, ln = dc_codes[tid][t]
                wtr.write(code, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[tid][0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    size = _category(v)
                    code, ln = ac_codes[tid][(run << 4) | size]
                    wtr.write(code, ln)
                    wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
                    run = 0
                if run:
                    code, ln = ac_codes[tid][0x00]
                    wtr.write(code, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
