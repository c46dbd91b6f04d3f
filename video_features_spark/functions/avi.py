"""Minimal-but-real MJPEG-in-AVI container codec, pure Python.

The reference's video scan is a ``cv2.VideoCapture`` frame-read loop with
timestamps derived from frame index / fps
(``/root/reference/utils/io.py:96-154``). This module gives that scan an
EXECUTABLE in-sandbox form for the one compressed-video container a
pure-Python stack can honestly support: AVI (RIFF — the same chunk grammar as
WAV) carrying baseline-JPEG frames, decoded by the repo's own T.81 decoder
(``functions/jpeg.py``). Codecs beyond MJPEG raise with the ffmpeg-adapter
recipe, mirroring the audio seam (``wav.demux_mp4_pcm``).

``encode_mjpeg_avi`` is the test/datagen-side twin (same pattern as
``wav.encode_mp4_pcm``): RIFF('AVI ') → LIST hdrl (avih + strl(strh 'vids'
'MJPG' + strf BITMAPINFOHEADER)) → LIST movi ('00dc' chunks) → idx1.
"""

from __future__ import annotations

import struct

_MJPG = b"MJPG"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_mjpeg_avi(frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """JPEG frame payloads → a minimal valid AVI (one MJPG video stream)."""
    if fps < 1 or not frames:
        raise ValueError("need fps >= 1 and at least one frame")
    usec = int(round(1_000_000 / fps))
    maxbuf = max(len(f) for f in frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec, maxbuf * fps, 0, 0x10,  # usec/frame, bytes/sec, pad, HASINDEX
            len(frames), 0, 1, maxbuf,    # total frames, initial, streams, bufsize
            width, height, 0, 0, 0, 0,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + _MJPG
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), maxbuf, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height),
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, _MJPG,
                    width * height * 3, 0, 0, 0, 0),
    )
    movi_chunks = [_chunk(b"00dc", f) for f in frames]
    # idx1 offsets are relative to the start of the movi LIST's data ('movi')
    idx, off = [], 4
    for f, ck in zip(frames, movi_chunks):
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))  # AVIIF_KEYFRAME
        off += len(ck)
    body = (
        _list(b"hdrl", avih + _list(b"strl", strh + strf))
        + _list(b"movi", b"".join(movi_chunks))
        + _chunk(b"idx1", b"".join(idx))
    )
    return _chunk(b"RIFF", b"AVI " + body)


def _iter_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("corrupt AVI: chunk overruns container")
        yield tag, body, body + size
        pos = body + size + (size & 1)


def _find_list(data: bytes, pos: int, end: int, kind: bytes):
    for tag, b, e in _iter_chunks(data, pos, end):
        if tag == b"LIST" and data[b : b + 4] == kind:
            return b + 4, e
    return None


from ._ffmpeg import has_ffmpeg  # noqa: F401 - re-export (adapter seam API)


def ffmpeg_to_mjpeg_avi(data: bytes) -> bytes:
    """Transcode any ffmpeg-supported video container/codec (H.264-mp4, VP9,
    mpeg4-avi, ...) to MJPEG-in-AVI — the executable adapter that makes
    ``demux_mjpeg_avi`` the single in-engine seam (the audio twin is
    ``wav.ffmpeg_to_wav``). Shared scaffold: ``functions/_ffmpeg.transcode``."""
    from ._ffmpeg import transcode

    return transcode(data, ["-c:v", "mjpeg", "-q:v", "2", "-an", "-f", "avi"], ".avi", 300)


def demux_video(data: bytes, allow_ffmpeg: bool = True) -> tuple[float, list[bytes]]:
    """Container dispatch for a video binary column: MJPEG-AVI demuxes
    in-process; anything else falls back to ``ffmpeg_to_mjpeg_avi`` where
    ffmpeg is on PATH, otherwise raises (the operator quarantines, S10)."""
    try:
        return demux_mjpeg_avi(data)
    except ValueError:
        if allow_ffmpeg and has_ffmpeg():
            return demux_mjpeg_avi(ffmpeg_to_mjpeg_avi(data))
        raise


def demux_mjpeg_avi(data: bytes) -> tuple[float, list[bytes]]:
    """AVI bytes → (fps, JPEG frame payloads). fps from the video stream's
    rate/scale (falling back to avih's µs-per-frame); frames from the movi
    '00dc'/'00db' chunks in stream order — the container half of the
    reference's frame-read loop (ts for frame i = i / fps)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/AVI magic")
    top, end = 12, len(data)
    hdrl = _find_list(data, top, end, b"hdrl")
    if hdrl is None:
        raise ValueError("corrupt AVI: no hdrl")
    # walk EVERY strl (multi-stream AVIs list audio/video streams in any
    # order): fps must come from the VIDEO stream's strh, and its codec must
    # be validated — taking the first strl would read an audio sample rate as
    # fps and skip the MJPG check entirely
    fps = None
    saw_video = False
    for tag, b, e in _iter_chunks(data, hdrl[0], hdrl[1]):
        if tag != b"LIST" or data[b : b + 4] != b"strl":
            continue
        for t2, b2, e2 in _iter_chunks(data, b + 4, e):
            if t2 != b"strh":
                continue
            if e2 - b2 < 28:
                raise ValueError("corrupt AVI: short strh")
            fcc_type, handler = data[b2 : b2 + 4], data[b2 + 4 : b2 + 8]
            if fcc_type != b"vids":
                continue
            saw_video = True
            if handler not in (_MJPG, b"mjpg"):
                raise ValueError(
                    f"unsupported AVI codec {handler!r}: only MJPG decodes "
                    "in-process; for other codecs run an ffmpeg mapInPandas "
                    "adapter that re-wraps frames upstream (see module doc)"
                )
            scale, rate = struct.unpack("<II", data[b2 + 20 : b2 + 28])
            if scale and rate:
                fps = rate / scale
    if not saw_video:
        raise ValueError("corrupt AVI: no video stream in hdrl")
    if fps is None:
        for tag, b, e in _iter_chunks(data, hdrl[0], hdrl[1]):
            if tag == b"avih":
                (usec,) = struct.unpack("<I", data[b : b + 4])
                if usec:
                    fps = 1_000_000 / usec
    if fps is None:
        raise ValueError("corrupt AVI: no frame rate in strh/avih")
    movi = _find_list(data, top, end, b"movi")
    if movi is None:
        raise ValueError("corrupt AVI: no movi list")

    def _frames_in(pos: int, stop: int):
        for tag, b, e in _iter_chunks(data, pos, stop):
            if tag[2:4] in (b"dc", b"db"):
                yield data[b:e]
            elif tag == b"LIST" and data[b : b + 4] == b"rec ":
                # interleaved writers group chunks in 'rec ' lists — recurse
                yield from _frames_in(b + 4, e)

    frames = list(_frames_in(movi[0], movi[1]))
    if not frames:
        raise ValueError("corrupt AVI: no frame chunks in movi")
    return float(fps), frames
