"""Audio family gates (S5/S6/P17/A6): WAV codec roundtrip, mono mixdown, mel
physics (sine → right band), framing formulas, end-to-end Spark extraction
with quarantine and cross-partitioning determinism, fp16 and augmentation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from video_features_spark.functions.wav import (
    NUM_MEL_BANDS,
    decode_wav,
    encode_wav,
    frame_signal,
    hz_to_mel,
    log_mel_spectrogram,
    logmel_examples,
    mel_filterbank,
    mono_mixdown,
)
from video_features_spark.operators.audio import extract_audio_features
from video_features_spark.sources.datagen import generate_audio


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(1)
    mono = rng.integers(-30000, 30000, 5000, dtype=np.int16)
    x, sr = decode_wav(encode_wav(mono, 16000))
    assert sr == 16000 and x.shape == (5000, 1) and (x[:, 0] == mono).all()
    stereo = rng.integers(-30000, 30000, (3000, 2), dtype=np.int16)
    y, _ = decode_wav(encode_wav(stereo, 8000))
    assert y.shape == (3000, 2) and (y == stereo).all()


def test_wav_decode_walks_extra_chunks():
    """Files from other encoders carry LIST/fact chunks before data."""
    import struct

    mono = np.arange(100, dtype=np.int16)
    raw = encode_wav(mono, 16000)
    fmt = raw[12:36]  # fmt chunk
    data = raw[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:12] + fmt + extra + data
    x, sr = decode_wav(patched)
    assert (x[:, 0] == mono).all() and sr == 16000


def test_wav_rejects_non_riff_and_non_pcm16():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x00" * 64)


def test_mono_mixdown_is_channel_mean():
    x = np.array([[32767, -32767], [100, 300]], dtype=np.int16)
    m = mono_mixdown(x)
    assert m.dtype == np.float32
    assert abs(m[0]) < 1e-4 and abs(m[1] - 200 / 32768.0) < 1e-6


def test_frame_signal_count_formula():
    x = np.zeros(16000, np.float32)
    f = frame_signal(x, 400, 160)
    assert f.shape == (1 + (16000 - 400) // 160, 400)
    assert frame_signal(np.zeros(399, np.float32), 400, 160).shape[0] == 0


def test_sine_lands_in_expected_mel_band():
    """1 kHz tone → energy peak in the mel band whose center is nearest
    1 kHz (the A6 mel-matmul physics check)."""
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    mel = log_mel_spectrogram(x, sr)
    peak_band = int(np.bincount(mel.argmax(axis=1)).argmax())
    edges = np.linspace(hz_to_mel(125.0), hz_to_mel(7500.0), NUM_MEL_BANDS + 2)
    expected = int(np.argmin(np.abs(edges[1:-1] - hz_to_mel(1000.0))))
    assert abs(peak_band - expected) <= 1


def test_logmel_examples_framing():
    sr = 16000
    x = np.zeros(2 * sr, np.float32)  # 2 s → 197 frames → 2 examples
    ex = logmel_examples(x, sr)
    n_frames = 1 + (2 * sr - 400) // 160
    assert ex.shape == (n_frames // 96, 96, NUM_MEL_BANDS)


def test_mel_filterbank_shape_and_coverage():
    bank = mel_filterbank()
    assert bank.shape == (257, NUM_MEL_BANDS)
    assert (bank >= 0).all() and (bank.sum(axis=0) > 0).all()


def test_extract_audio_features_end_to_end(spark):
    clips = generate_audio(spark, 30, n_entities=5).cache()
    feats = extract_audio_features(clips).cache()
    ok = feats.filter(F.col("error").isNull())
    # exact example count per clip, computable from n_samples without decoding
    expected = clips.select(
        "clip_id",
        F.floor((F.lit(1) + F.floor((F.col("n_samples") - 400) / 160)) / 96).alias("n_exp"),
    )
    got = ok.groupBy("clip_id").agg(F.count(F.lit(1)).alias("n_got"))
    mism = got.join(expected, "clip_id").filter(F.col("n_got") != F.col("n_exp"))
    assert mism.count() == 0, mism.collect()
    # embeddings are unit-norm 128-d
    norm = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
    assert ok.filter(F.abs(norm - 1.0) > 1e-4).count() == 0
    assert ok.filter(F.size("embedding") != 128).count() == 0
    # stereo clips decode through the mixdown (some exist by construction)
    assert clips.filter("n_channels = 2").count() > 0


def test_audio_determinism_across_partitionings(spark):
    clips = generate_audio(spark, 20, n_entities=4)
    a = extract_audio_features(clips.repartition(1))
    b = extract_audio_features(clips.repartition(8))
    pa = {(r["clip_id"], r["example_idx"]): r["embedding"] for r in a.collect()}
    pb = {(r["clip_id"], r["example_idx"]): r["embedding"] for r in b.collect()}
    assert pa == pb


def test_audio_too_short_clip_quarantined(spark):
    tiny = encode_wav(np.zeros(1000, np.int16), 16000)
    df = spark.createDataFrame(
        [("c0", "e0", bytearray(tiny))], "clip_id string, entity_id string, audio binary"
    )
    out = extract_audio_features(df, id_cols=("clip_id", "entity_id")).collect()
    assert len(out) == 1 and out[0]["error"] == "too_short"
    assert out[0]["embedding"] is None
    bad = spark.createDataFrame(
        [("c1", "e0", bytearray(b"not a wav at all, definitely"))],
        "clip_id string, entity_id string, audio binary",
    )
    outb = extract_audio_features(bad, id_cols=("clip_id", "entity_id")).collect()
    assert len(outb) == 1 and "ValueError" in outb[0]["error"]


def test_fp16_precision_close_but_quantized(spark):
    from video_features_spark.operators.features import extract_image_features
    from video_features_spark.sources.datagen import generate_images

    imgs = generate_images(spark, 10, n_entities=2).cache()
    f32 = {r["image_id"]: np.array(r["embedding"], np.float32)
           for r in extract_image_features(imgs).collect()}
    f16 = {r["image_id"]: np.array(r["embedding"], np.float32)
           for r in extract_image_features(imgs, precision="fp16").collect()}
    diffs = [float(np.abs(f32[k] - f16[k]).max()) for k in f32]
    assert max(diffs) > 0  # the cast genuinely quantizes
    assert all(np.allclose(f32[k], f16[k], atol=5e-2) for k in f32)
    # deterministic: same fp16 run twice is bit-identical
    f16b = {r["image_id"]: np.array(r["embedding"], np.float32)
            for r in extract_image_features(imgs.repartition(5), precision="fp16").collect()}
    assert all((f16[k] == f16b[k]).all() for k in f16)


def test_augmentation_deterministic_and_diverse(spark):
    from video_features_spark.operators.features import extract_image_features
    from video_features_spark.sources.datagen import generate_images

    imgs = generate_images(spark, 20, n_entities=2).cache()
    clean = {r["image_id"]: np.array(r["embedding"], np.float32)
             for r in extract_image_features(imgs).collect()}
    aug = {r["image_id"]: np.array(r["embedding"], np.float32)
           for r in extract_image_features(imgs, augment_seed=11).collect()}
    aug2 = {r["image_id"]: np.array(r["embedding"], np.float32)
            for r in extract_image_features(imgs.repartition(7), augment_seed=11).collect()}
    # bit-identical across partitionings at the same seed (resume contract)
    assert all((aug[k] == aug2[k]).all() for k in aug)
    # and genuinely different from the clean pipeline for most rows
    changed = sum(not np.allclose(clean[k], aug[k], atol=1e-6) for k in clean)
    assert changed >= len(clean) // 2


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 4000),
    ch=st.integers(1, 2),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(seed, n, ch, sr):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, (n, ch), dtype=np.int16)
    x, sr2 = decode_wav(encode_wav(pcm if ch > 1 else pcm[:, 0], sr))
    assert sr2 == sr and x.shape == (n, ch) and (x == pcm).all()


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 4000),
    ch=st.integers(1, 2),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_mp4_pcm_roundtrip_property(seed, n, ch, sr):
    """Container seam (S5 completion): mp4-wrapped PCM16 demuxes bit-exactly
    through the same demux_audio seam as WAV."""
    from video_features_spark.functions.wav import demux_audio, encode_mp4_pcm

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, (n, ch), dtype=np.int16)
    data = encode_mp4_pcm(pcm if ch > 1 else pcm[:, 0], sr)
    assert data[4:8] == b"ftyp"
    x, sr2 = demux_audio(data)
    assert sr2 == sr and x.shape == (n, ch) and (x == pcm).all()


def test_mp4_compressed_codec_raises_with_adapter_hint():
    from video_features_spark.functions.wav import demux_audio, encode_mp4_pcm

    data = bytearray(encode_mp4_pcm(np.zeros(100, np.int16)))
    i = data.find(b"sowt")
    data[i : i + 4] = b"mp4a"  # pretend the track is AAC
    with pytest.raises(ValueError, match="ffmpeg mapInPandas adapter"):
        demux_audio(bytes(data))
    with pytest.raises(ValueError, match="unknown audio container"):
        demux_audio(b"\x00" * 32)


def test_container_wrapped_audio_end_to_end(spark):
    """One clip wrapped in mp4 must flow through extract_audio_features and
    produce embeddings bit-identical to the same PCM wrapped as WAV."""
    from video_features_spark.functions.wav import encode_mp4_pcm, encode_wav
    from video_features_spark.operators.audio import extract_audio_features

    rng = np.random.default_rng(3)
    pcm = (np.sin(2 * np.pi * 440 * np.arange(32000) / 16000) * 12000).astype(np.int16)
    pcm = np.stack([pcm, (pcm * 0.7).astype(np.int16)], axis=1)
    rows = [
        ("wav", bytearray(encode_wav(pcm, 16000))),
        ("mp4", bytearray(encode_mp4_pcm(pcm, 16000))),
    ]
    df = spark.createDataFrame(rows, "clip_id string, audio binary")
    out = extract_audio_features(df, id_cols=("clip_id",)).collect()
    by = {}
    for r in out:
        assert r["error"] is None
        by.setdefault(r["clip_id"], {})[r["example_idx"]] = np.array(r["embedding"], np.float32)
    assert set(by) == {"wav", "mp4"} and len(by["wav"]) == len(by["mp4"]) == 2
    for k in by["wav"]:
        assert (by["wav"][k] == by["mp4"][k]).all()


@pytest.mark.skipif(
    not __import__("shutil").which("ffmpeg"), reason="ffmpeg not on PATH"
)
def test_ffmpeg_adapter_decodes_compressed(spark):
    """S5/S2 completion gate: a COMPRESSED payload (AAC-in-mp4, encoded here
    with ffmpeg itself) flows through extract_audio_features via the
    demux_audio → ffmpeg_to_wav fallback — the executable form of the adapter
    recipe the reference implements by shelling out (utils/utils.py:194-223).
    AAC is lossy so embeddings aren't compared; the gate is that decode
    succeeds, nothing quarantines, and the example framing matches the
    lossless WAV twin."""
    import subprocess
    import tempfile

    from video_features_spark.functions.wav import demux_audio, encode_wav
    from video_features_spark.operators.audio import extract_audio_features

    pcm = (np.sin(2 * np.pi * 330 * np.arange(32000) / 16000) * 12000).astype(np.int16)
    wav = encode_wav(pcm, 16000)
    with tempfile.NamedTemporaryFile(suffix=".m4a") as tf:
        subprocess.run(
            ["ffmpeg", "-v", "error", "-f", "wav", "-i", "pipe:0",
             "-acodec", "aac", "-y", tf.name],
            input=wav, check=True, capture_output=True, timeout=120,
        )
        compressed = open(tf.name, "rb").read()
    # kernel-level: sniffed as ISO-BMFF, mp4a codec → ffmpeg fallback
    x, sr = demux_audio(compressed)
    assert sr == 16000 and len(x) > 0
    rows = [("wav", bytearray(wav)), ("aac", bytearray(compressed))]
    df = spark.createDataFrame(rows, "clip_id string, audio binary")
    out = extract_audio_features(df, id_cols=("clip_id",)).collect()
    by = {}
    for r in out:
        assert r["error"] is None
        by.setdefault(r["clip_id"], set()).add(r["example_idx"])
    assert set(by) == {"wav", "aac"} and by["wav"] == by["aac"]


@given(data=st.data())
@settings(max_examples=120, deadline=None)
def test_audio_fuzz_adversarial_containers_raise_cleanly(data):
    """Adversarial-container gate for the audio demux (same contract as the
    AVI fuzzer in test_video.py): ANY truncation or byte mutation of a valid
    WAV or mp4-PCM container either still demuxes or raises a plain
    ``Exception`` subclass the operator quarantine catches — never a hang,
    never an unbounded allocation from a corrupt size field."""
    from video_features_spark.functions.wav import demux_audio, encode_mp4_pcm

    rng = np.random.default_rng(data.draw(st.integers(0, 7)))
    pcm = (rng.standard_normal(400) * 8000).astype(np.int16)
    container = data.draw(st.sampled_from(["wav", "mp4"]))
    blob = bytearray(
        encode_wav(pcm, 8000) if container == "wav" else encode_mp4_pcm(pcm, 8000)
    )
    mode = data.draw(st.sampled_from(["truncate", "mutate", "both"]))
    if mode in ("truncate", "both"):
        blob = blob[: data.draw(st.integers(0, len(blob)))]
    if mode in ("mutate", "both") and len(blob):
        for _ in range(data.draw(st.integers(1, 4))):
            pos = data.draw(st.integers(0, len(blob) - 1))
            blob[pos] = data.draw(st.integers(0, 255))
    try:
        x, sr = demux_audio(bytes(blob), allow_ffmpeg=False)
    except Exception:
        pass  # quarantine path: any Exception subclass is caught upstream
    except BaseException as e:  # noqa: BLE001
        raise AssertionError(
            f"demux raised a non-Exception {type(e).__name__}: the operator "
            "quarantine would not catch it"
        ) from e
    else:
        assert sr > 0 and isinstance(x, np.ndarray)


def test_wav_pcm24_and_float_roundtrip():
    """VERDICT r6 item: real corpora carry 24-bit and float WAVs. PCM24
    roundtrips exactly at 24-bit precision (→ float32 ÷2^23); IEEE-float32
    roundtrips bit-exactly; mono_mixdown normalizes each dtype correctly."""
    import numpy as np

    from video_features_spark.functions.wav import decode_wav, encode_wav, mono_mixdown

    rng = np.random.default_rng(9)
    # PCM24 stereo
    p24 = rng.integers(-(1 << 23), 1 << 23, (480, 2), dtype=np.int32)
    out, sr = decode_wav(encode_wav(p24, 16000))
    assert sr == 16000 and out.dtype == np.float32 and out.shape == (480, 2)
    assert np.array_equal(np.round(out * (1 << 23)).astype(np.int32), p24)
    # IEEE float32 mono
    f32 = (rng.standard_normal(512) * 0.4).astype(np.float32)
    out, sr = decode_wav(encode_wav(f32, 8000))
    assert out.dtype == np.float32 and np.array_equal(out[:, 0], f32)
    # mixdown: float input only averages; int16 still scales by 2^15
    m = mono_mixdown(out)
    assert np.allclose(m, f32, atol=0)
    i16 = np.full((4, 2), 16384, np.int16)
    assert np.allclose(mono_mixdown(i16), 0.5)


def test_wav_extensible_and_pcm32_decode():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through the SubFormat GUID;
    PCM32 normalizes by 2^31."""
    import struct

    import numpy as np

    from video_features_spark.functions.wav import decode_wav

    # hand-build an extensible-PCM16 file (fmt chunk of 40 bytes + GUID)
    x = np.array([[1000], [-2000], [32767]], "<i2")
    data = x.tobytes()
    # 40-byte fmt body: base fields + cbSize(22) + validbits + chanmask +
    # 16-byte SubFormat GUID whose first two bytes carry the real fmt code
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 1) + guid
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, sr = decode_wav(blob)
    assert sr == 16000 and out.dtype == np.int16
    assert np.array_equal(out[:, 0], x[:, 0])
    # PCM32
    v = np.array([1 << 30, -(1 << 30), 0], "<i4")
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 16000, 64000, 4, 32)
    body = b"fmt " + fmt + b"data" + struct.pack("<I", 12) + v.tobytes()
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, sr = decode_wav(blob)
    assert out.dtype == np.float32
    assert np.allclose(out[:, 0], [0.5, -0.5, 0.0])
