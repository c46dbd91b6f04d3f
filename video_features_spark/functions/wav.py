"""WAV codec + mel-spectrogram kernels (pure numpy, no audio libs needed).

Spark-side analog of the reference's audio path: WAV read via soundfile
(``/root/reference/models/vggish/vggish_src/vggish_input.py:75-83``), mono
mixdown by channel mean (``vggish_input.py:53-54``), 25 ms/10 ms STFT framing
with an HTK-mel filterbank matmul and log compression
(``vggish_src/mel_features.py:100-221``), 0.96 s examples of 96 frames
(``vggish_params.py:30-35``). The numbers here follow the same *published*
VGGish front-end constants; the code is written fresh against the formulas.

The WAV container is implemented against the RIFF spec directly (PCM16), so a
``binary`` audio column round-trips bit-exactly with zero dependencies — the
multimodal-column contract: opaque bytes + typed metadata, decode at the edge.
"""

from __future__ import annotations

import struct

import numpy as np

# VGGish front-end constants (vggish_params.py:24-35 — published)
SAMPLE_RATE = 16000
STFT_WINDOW_SEC = 0.025
STFT_HOP_SEC = 0.010
NUM_MEL_BANDS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_SEC = 0.96  # 96 frames
EXAMPLE_HOP_SEC = 0.96  # non-overlapping examples

WAV_HEADER_BYTES = 44  # canonical PCM fmt+data header this encoder emits


def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """PCM samples (n,) or (n, ch) → RIFF/WAVE bytes. dtype picks the
    on-disk format: int16 → PCM16 (the 44-byte header every consumer of this
    encoder has always seen), float32 → IEEE-float (fmt 3), int32 → PCM24
    (values must fit ±2^23; low 3 LE bytes packed) — the two extra formats
    real corpora carry (decode side handles them + WAVE_FORMAT_EXTENSIBLE)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if x.dtype == np.float32:
        fmt_code, width = 3, 4
        data = np.ascontiguousarray(x, dtype="<f4").tobytes()
    elif x.dtype == np.int32:
        fmt_code, width = 1, 3
        # asymmetric range check: -2^23 is a legal 24-bit sample (r6 advice —
        # abs() rejected the most-negative representable value)
        if int(x.max(initial=0)) >= 1 << 23 or int(x.min(initial=0)) < -(1 << 23):
            raise ValueError("PCM24 samples must fit in [-2^23, 2^23)")
        b4 = np.ascontiguousarray(x, dtype="<i4").view(np.uint8).reshape(-1, 4)
        data = np.ascontiguousarray(b4[:, :3]).tobytes()  # low 3 LE bytes
    else:
        fmt_code, width = 1, 2
        data = np.ascontiguousarray(x, dtype="<i2").tobytes()
    n, ch = x.shape
    byte_rate = sample_rate * ch * width
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_code, ch, sample_rate, byte_rate, ch * width, width * 8
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (array (n, ch), sample_rate). Walks the chunk list
    (files from other encoders may carry LIST/fact chunks). Formats: PCM16 →
    int16 (bit-compatible with every existing consumer); PCM24/PCM32 →
    float32 in [-1, 1] (÷2²³ / ÷2³¹); IEEE float32/float64 (fmt 3) →
    float32 as stored; WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its
    SubFormat GUID. Real corpora carry all of these — the reference gets
    them for free from ffmpeg (utils/io.py); this decode is the
    dependency-free twin."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, ch, sr, bits = 12, None, None, None
    fmt_code = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_code == 0xFFFE and len(body) >= 40:
                # extensible: the real format is the SubFormat GUID's first
                # two bytes (bits stays the container width)
                (fmt_code,) = struct.unpack("<H", body[24:26])
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if pcm is None or ch is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        return np.frombuffer(pcm, dtype="<i2").reshape(-1, ch), sr
    if fmt_code == 1 and bits == 24:
        b = np.frombuffer(pcm[: len(pcm) - len(pcm) % 3], np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend 24→32
        return (v.astype(np.float32) / float(1 << 23)).reshape(-1, ch), sr
    if fmt_code == 1 and bits == 32:
        v = np.frombuffer(pcm, dtype="<i4")
        return (v.astype(np.float32) / float(1 << 31)).reshape(-1, ch), sr
    if fmt_code == 3 and bits == 32:
        return np.frombuffer(pcm, dtype="<f4").reshape(-1, ch).copy(), sr
    if fmt_code == 3 and bits == 64:
        return np.frombuffer(pcm, dtype="<f8").astype(np.float32).reshape(-1, ch), sr
    raise ValueError(f"unsupported WAV format (fmt={fmt_code}, bits={bits})")


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for the ISO-BMFF boxes in
    data[pos:end]; handles 64-bit largesize and size-0 (to end of file)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("corrupt MP4: bad box size")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("corrupt MP4: bad box size")
        yield tag, body, pos + size
        pos += size


def _mp4_find(data: bytes, pos: int, end: int, tag: bytes):
    """Depth-first search for the first box of ``tag`` under [pos, end)."""
    for t, b, e in _mp4_boxes(data, pos, end):
        if t == tag:
            return b, e
        if t in _MP4_CONTAINERS:
            hit = _mp4_find(data, b, e, tag)
            if hit is not None:
                return hit
    return None


def demux_mp4_pcm(data: bytes) -> tuple[np.ndarray, int]:
    """Minimal ISO-BMFF (mp4/mov) audio demux for the trivial-but-real case:
    one uncompressed PCM16 track ('sowt' little-endian / 'twos' big-endian
    sample entry) in one contiguous mdat — the Spark-side seam for the
    reference's extract-audio-from-mp4 step
    (``/root/reference/utils/utils.py:194-223``, which shells out to ffmpeg
    twice: mp4→aac→wav). Compressed codecs ('mp4a' AAC etc.) raise with the
    adapter recipe: decode via an ffmpeg-subprocess ``mapInPandas`` stage that
    rewraps to WAV bytes upstream of this seam — same per-row quarantine
    contract, no engine change (this container ships no ffmpeg, so that stage
    stays documented rather than imported)."""
    stsd = _mp4_find(data, 0, len(data), b"stsd")
    if stsd is None:
        raise ValueError("corrupt MP4: no stsd sample description")
    b, e = stsd
    (entry_count,) = struct.unpack(">I", data[b + 4 : b + 8])
    if entry_count < 1:
        raise ValueError("corrupt MP4: empty stsd")
    # first sample entry box: [size][format] + AudioSampleEntry fields
    fmt = data[b + 12 : b + 16]
    if fmt not in (b"sowt", b"twos"):
        raise ValueError(
            f"unsupported MP4 audio codec {fmt!r}: only raw PCM16 (sowt/twos) "
            "demuxes here; for compressed tracks run an ffmpeg mapInPandas "
            "adapter that rewraps to WAV upstream (see demux_mp4_pcm docstring)"
        )
        # AudioSampleEntry: 6 reserved + data_ref(2) + ver(2) + rev(2) +
        # vendor(4) + channels(2) + samplesize(2) + comp(2) + pkt(2) + sr(16.16)
    off = b + 16
    ch, samplesize = struct.unpack(">HH", data[off + 16 : off + 20])
    (sr_fixed,) = struct.unpack(">I", data[off + 24 : off + 28])
    sr = sr_fixed >> 16
    if samplesize != 16 or ch < 1 or sr < 1:
        raise ValueError(f"unsupported MP4 PCM layout (bits={samplesize}, ch={ch}, sr={sr})")
    mdat = _mp4_find(data, 0, len(data), b"mdat")
    if mdat is None:
        raise ValueError("corrupt MP4: no mdat")
    payload = data[mdat[0] : mdat[1]]
    dt = "<i2" if fmt == b"sowt" else ">i2"
    n = len(payload) // (2 * ch) * (2 * ch)
    x = np.frombuffer(payload[:n], dtype=dt).astype("<i2")
    return x.reshape(-1, ch), sr


def encode_mp4_pcm(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """int16 PCM (n,) or (n, ch) → minimal valid mp4 (ftyp+moov+mdat, 'sowt'
    sample entry, real stts/stsz/stco tables) — the test-side twin of
    ``demux_mp4_pcm`` so the container path is exercised end-to-end without
    ffmpeg."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    frame_bytes = 2 * ch

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    entry = box(
        b"sowt",
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_ref_index
        + struct.pack(">HHI", 0, 0, 0)  # version, revision, vendor
        + struct.pack(">HHHH", ch, 16, 0, 0)  # channels, bits, comp, packet
        + struct.pack(">I", sample_rate << 16),  # 16.16 fixed
    )
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stts = box(b"stts", struct.pack(">IIII", 0, 1, n, 1))
    stsc = box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n, 1))
    stsz = box(b"stsz", struct.pack(">III", 0, frame_bytes, n))
    mdhd = box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, sample_rate, n, 0x55C4, 0))
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"soun" + b"\x00" * 13)

    def moov_with(offset: int) -> bytes:
        stco = box(b"stco", struct.pack(">III", 0, 1, offset))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", mdia)
        return box(b"moov", trak)

    # stco is fixed-size, so one rebuild pins the real mdat payload offset
    probe = moov_with(0)
    moov = moov_with(len(ftyp) + len(probe) + 8)
    return ftyp + moov + box(b"mdat", x.tobytes())


from ._ffmpeg import has_ffmpeg  # noqa: F401 - re-export (adapter seam API)


def ffmpeg_to_wav(data: bytes) -> bytes:
    """Transcode any ffmpeg-supported compressed audio (or A/V container) to
    RIFF/WAVE PCM16 — the EXECUTABLE form of the adapter recipe in
    ``demux_mp4_pcm``'s docstring (the reference shells out the same way:
    ``/root/reference/utils/utils.py:194-223``, mp4→aac→wav). Per-row
    subprocess cost is inherent to compressed decode; the reference pays it
    per file too. Shared scaffold: ``functions/_ffmpeg.transcode``."""
    from ._ffmpeg import transcode

    return transcode(data, ["-acodec", "pcm_s16le", "-f", "wav"], ".wav", 120)


def demux_audio(data: bytes, allow_ffmpeg: bool = True) -> tuple[np.ndarray, int]:
    """Container dispatch for the ``audio`` binary column: RIFF/WAVE →
    ``decode_wav``; ISO-BMFF (ftyp) with raw PCM16 → ``demux_mp4_pcm``. One
    seam, sniffed by magic — the audio twin of ``codec.decode_image``'s
    format sniffing. Compressed codecs and unknown containers fall back to
    ``ffmpeg_to_wav`` where ffmpeg is on PATH (S5 completion; gated by a
    skipif test — this sandbox ships no ffmpeg); otherwise they raise and the
    operator quarantines the row (S10)."""
    if data[:4] == b"RIFF":
        return decode_wav(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        try:
            return demux_mp4_pcm(data)
        except ValueError:
            if allow_ffmpeg and has_ffmpeg():
                return decode_wav(ffmpeg_to_wav(data))
            raise
    if allow_ffmpeg and has_ffmpeg():
        return decode_wav(ffmpeg_to_wav(data))
    raise ValueError("unknown audio container: not RIFF/WAVE or ISO-BMFF")


def mono_mixdown(x: np.ndarray) -> np.ndarray:
    """(n, ch) → (n,) float32 in [-1, 1]: channel mean then scale — the
    reference's ``np.mean(data, axis=1)`` mixdown (vggish_input.py:53-54).
    int16 input divides by 2^15; float input (decode_wav's PCM24/32 and
    IEEE-float outputs) is already normalized and only averages."""
    if np.issubdtype(x.dtype, np.floating):
        return x.astype(np.float32).mean(axis=1).astype(np.float32)
    return (x.astype(np.float32).mean(axis=1) / 32768.0).astype(np.float32)


def hz_to_mel(f):
    """HTK mel scale (mel_features.py:157-159 uses the same published formula)."""
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_filterbank(
    n_mels: int = NUM_MEL_BANDS,
    n_fft_bins: int | None = None,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = MEL_MIN_HZ,
    fmax: float = MEL_MAX_HZ,
) -> np.ndarray:
    """(n_fft_bins, n_mels) triangular filter matrix — the A6 "mel matmul"
    operand. Peaks spaced uniformly in mel between fmin and fmax."""
    if n_fft_bins is None:
        n_fft_bins = _n_fft(sample_rate) // 2 + 1
    spec_hz = np.linspace(0.0, sample_rate / 2.0, n_fft_bins)
    spec_mel = hz_to_mel(spec_hz)
    edges = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    bank = np.zeros((n_fft_bins, n_mels), np.float64)
    for i in range(n_mels):
        lo, ctr, hi = edges[i], edges[i + 1], edges[i + 2]
        up = (spec_mel - lo) / (ctr - lo)
        down = (hi - spec_mel) / (hi - ctr)
        bank[:, i] = np.maximum(0.0, np.minimum(up, down))
    bank[0, :] = 0.0  # DC bin carries no band energy (mel_features.py:205-207)
    return bank.astype(np.float32)


def _n_fft(sample_rate: int) -> int:
    win = int(round(STFT_WINDOW_SEC * sample_rate))
    n = 1
    while n < win:
        n *= 2
    return n


def frame_signal(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """(n,) → (n_frames, frame_len) strided framing, complete frames only —
    the W5 pattern (mel_features.py:21-45 semantics)."""
    n_frames = 1 + (len(x) - frame_len) // hop if len(x) >= frame_len else 0
    if n_frames <= 0:
        return np.empty((0, frame_len), np.float32)
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[idx]


def log_mel_spectrogram(x: np.ndarray, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """mono float32 (n,) → (n_frames, NUM_MEL_BANDS) log-mel features:
    Hann window → |rFFT| → mel filterbank matmul → log(S + offset).
    Deterministic: fixed window, fixed bank, per-frame independent."""
    win_len = int(round(STFT_WINDOW_SEC * sample_rate))
    hop = int(round(STFT_HOP_SEC * sample_rate))
    frames = frame_signal(x, win_len, hop)
    if not len(frames):
        return np.empty((0, NUM_MEL_BANDS), np.float32)
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi / win_len * np.arange(win_len))
    mag = np.abs(np.fft.rfft(frames * window, int(_n_fft(sample_rate))))
    bank = mel_filterbank(NUM_MEL_BANDS, mag.shape[1], sample_rate)
    return np.log(mag @ bank + LOG_OFFSET).astype(np.float32)


def logmel_examples(x: np.ndarray, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """mono float32 → (n_examples, 96, NUM_MEL_BANDS): frame the log-mel into
    0.96 s non-overlapping examples (vggish_input.py:59-70)."""
    mel = log_mel_spectrogram(x, sample_rate)
    frames_per_ex = int(round(EXAMPLE_WINDOW_SEC / STFT_HOP_SEC))
    n_ex = len(mel) // frames_per_ex
    if n_ex <= 0:
        return np.empty((0, frames_per_ex, NUM_MEL_BANDS), np.float32)
    return mel[: n_ex * frames_per_ex].reshape(n_ex, frames_per_ex, NUM_MEL_BANDS)
