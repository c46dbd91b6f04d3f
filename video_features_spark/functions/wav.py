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
    """int16 PCM samples (n,) or (n, ch) → RIFF/WAVE bytes (44-byte header)."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    data = x.tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → (int16 array (n, ch), sample_rate). Walks the
    chunk list (files from other encoders may carry LIST/fact chunks)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, ch, sr, bits = 12, None, None, None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (fmt={fmt_code}, bits={bits})")
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if pcm is None or ch is None:
        raise ValueError("missing fmt/data chunk")
    x = np.frombuffer(pcm, dtype="<i2")
    return x.reshape(-1, ch), sr


def mono_mixdown(x: np.ndarray) -> np.ndarray:
    """(n, ch) int16 → (n,) float32 in [-1, 1]: channel mean then scale —
    the reference's ``np.mean(data, axis=1)`` mixdown (vggish_input.py:53-54)."""
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
