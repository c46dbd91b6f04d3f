"""Gates for the S2 video scan: MJPEG-AVI container codec, frame-stream
operator (counts, ts derivation, quarantine), and the composition into the
image embed pipeline — the reference's video → preprocess → model chain
(utils/io.py:96-154 → extract_clip.py) end to end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from video_features_spark.functions.avi import demux_mjpeg_avi, encode_mjpeg_avi
from video_features_spark.functions.jpeg import encode_jpeg
from video_features_spark.operators.video import extract_video_frames
from video_features_spark.sources.datagen import generate_videos

N_CLIPS, N_ENT = 8, 3


@pytest.fixture(scope="module")
def videos(spark):
    df = generate_videos(spark, N_CLIPS, n_entities=N_ENT).cache()
    df.count()
    return df


def test_avi_roundtrip_and_errors():
    rng = np.random.default_rng(5)
    frames = [
        encode_jpeg(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8), quality=97)
        for _ in range(4)
    ]
    blob = encode_mjpeg_avi(frames, fps=5, width=48, height=32)
    fps, out = demux_mjpeg_avi(blob)
    assert fps == 5.0 and out == frames
    with pytest.raises(ValueError, match="RIFF/AVI"):
        demux_mjpeg_avi(b"nope")
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        demux_mjpeg_avi(blob.replace(b"vidsMJPG", b"vidsH264"))


def test_frame_stream_counts_ts_and_quarantine(spark, videos):
    """Every container frame becomes a row; frame_ts = clip ts + idx/fps
    (the reference's ts derivation); a corrupt clip quarantines per-row."""
    frames = extract_video_frames(videos).cache()
    expected = videos.agg(F.sum("n_frames")).first()[0]
    assert frames.count() == expected
    assert frames.filter("error is not null").count() == 0
    # ts derivation: idx/fps seconds after the clip ts (fps=4 → 250 ms steps)
    joined = frames.join(videos.select("video_id", "ts", "fps"), "video_id")
    bad = joined.filter(
        F.abs(
            F.col("frame_ts").cast("double")
            - (F.col("ts").cast("double") + F.col("frame_idx") / F.col("fps"))
        )
        > 1e-6
    )
    assert bad.count() == 0
    corrupt = spark.createDataFrame(
        [("bad0", "e0", None, bytearray(b"not an avi"))],
        "video_id string, entity_id string, ts timestamp, video binary",
    )
    q = extract_video_frames(corrupt).collect()
    assert len(q) == 1 and q[0]["error"] is not None and q[0]["frame_idx"] is None


def test_video_feeds_image_pipeline_map_only(spark, videos):
    """The frame stream composes into extract_image_features unchanged and
    the whole container→frames→decode→embed chain plans with ZERO exchanges
    (embarrassingly parallel — the property that scales with executors)."""
    import contextlib
    import io

    from video_features_spark.operators.features import extract_image_features

    frames = extract_video_frames(videos).withColumnRenamed("frame_ts", "ts2")
    feats = extract_image_features(
        frames.filter("error is null").select(
            F.col("video_id").alias("image_id"),
            "entity_id",
            F.col("ts2").alias("ts"),
            "bytes",
            "fmt",
        )
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        feats.explain("formatted")
    assert " Exchange " not in buf.getvalue()
    rows = feats.limit(0)  # schema only; full embed runs below
    assert "embedding" in rows.columns
    got = feats.filter("error is null").count()
    assert got == videos.agg(F.sum("n_frames")).first()[0]


@pytest.mark.skipif(
    not __import__("shutil").which("ffmpeg"), reason="ffmpeg not on PATH"
)
def test_ffmpeg_video_adapter_decodes_foreign_codec(spark):
    """S2 completion gate for foreign codecs: an mpeg4-AVI (encoded here with
    ffmpeg's native encoder) is NOT MJPEG, so the in-process demux refuses it;
    demux_video falls back to an ffmpeg MJPEG transcode and the frame stream
    flows through extract_video_frames with the frame count preserved."""
    import subprocess
    import tempfile

    from video_features_spark.functions.avi import demux_mjpeg_avi, demux_video

    rng = np.random.default_rng(11)
    frames = [
        encode_jpeg(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8), quality=97)
        for _ in range(6)
    ]
    src = encode_mjpeg_avi(frames, fps=4, width=48, height=32)
    with tempfile.NamedTemporaryFile(suffix=".avi") as tf:
        subprocess.run(
            ["ffmpeg", "-v", "error", "-f", "avi", "-i", "pipe:0",
             "-c:v", "mpeg4", "-q:v", "2", "-an", "-y", tf.name],
            input=src, check=True, capture_output=True, timeout=300,
        )
        foreign = open(tf.name, "rb").read()
    with pytest.raises(ValueError):
        demux_mjpeg_avi(foreign)  # not MJPEG — in-process demux refuses
    fps, out = demux_video(foreign)  # adapter transcodes back to MJPEG
    assert len(out) == len(frames) and fps == 4.0
    df = spark.createDataFrame(
        [("v0", "e0", None, bytearray(foreign))],
        "video_id string, entity_id string, ts timestamp, video binary",
    )
    rows = extract_video_frames(df).collect()
    assert len(rows) == len(frames) and all(r["error"] is None for r in rows)


def test_avi_rec_list_interleaving():
    """Interleaved writers wrap frame chunks in 'rec ' LISTs inside movi —
    the demux recurses into them (real-world AVI layout, not just ours)."""
    from video_features_spark.functions.avi import _chunk, _list

    rng = np.random.default_rng(2)
    frames = [
        encode_jpeg(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    plain = encode_mjpeg_avi(frames, 4, 32, 32)
    mpos = plain.find(b"movi")
    hdr = plain[12 : mpos - 8]
    rec = _list(b"rec ", b"".join(_chunk(b"00dc", f) for f in frames))
    wrapped = _chunk(b"RIFF", b"AVI " + hdr + _list(b"movi", rec))
    fps, out = demux_mjpeg_avi(wrapped)
    assert fps == 4.0 and out == frames


def test_avi_multi_stream_fps_from_video_stream():
    """fps must come from the VIDEO stream's strh even when an audio stream
    is listed first (legal RIFF ordering), and the video codec check must
    still fire — the first-strl shortcut read an audio sample rate as fps."""
    import struct

    from video_features_spark.functions.avi import _chunk, _list

    rng = np.random.default_rng(9)
    frames = [encode_jpeg(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))]
    plain = encode_mjpeg_avi(frames, fps=4, width=32, height=32)

    def strh(fcc, handler, scale, rate):
        return _chunk(
            b"strh",
            fcc + handler
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0, 1, 0, 0, 0)
            + struct.pack("<4h", 0, 0, 32, 32),
        )

    # rebuild hdrl: avih + [auds strl @ 44100] + [vids strl @ 4 fps]
    hpos = plain.find(b"hdrl")
    avih_start = hpos + 4
    (avih_size,) = struct.unpack("<I", plain[avih_start + 4 : avih_start + 8])
    avih = plain[avih_start : avih_start + 8 + avih_size]
    mpos = plain.find(b"movi")
    movi_list = plain[mpos - 8 :]
    hdrl = _list(
        b"hdrl",
        avih
        + _list(b"strl", strh(b"auds", b"\x00\x00\x00\x00", 1, 44100))
        + _list(b"strl", strh(b"vids", b"MJPG", 1, 4)),
    )
    rebuilt = _chunk(b"RIFF", b"AVI " + hdrl + movi_list)
    fps, out = demux_mjpeg_avi(rebuilt)
    assert fps == 4.0 and out == frames  # not 44100
    # and a foreign VIDEO codec is rejected even behind an audio stream
    bad = _chunk(
        b"RIFF",
        b"AVI "
        + _list(
            b"hdrl",
            avih
            + _list(b"strl", strh(b"auds", b"\x00\x00\x00\x00", 1, 44100))
            + _list(b"strl", strh(b"vids", b"H264", 1, 4)),
        )
        + movi_list,
    )
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        demux_mjpeg_avi(bad)


def test_total_mode_samples_evenly(spark, videos):
    """The reference's fixed-frame-count mode (utils/io.py:83-88): exactly
    `total` evenly-spaced frames per clip, first frame kept, original
    indices preserved (frame_ts stays true event time); short clips emit
    everything."""
    frames = extract_video_frames(videos, total=3).cache()
    per_clip = {
        r["video_id"]: r["n"]
        for r in frames.groupBy("video_id").agg(F.count("*").alias("n")).collect()
    }
    meta = {r["video_id"]: r["n_frames"] for r in videos.collect()}
    assert per_clip == {v: min(3, meta[v]) for v in meta}
    # first and last container frames are always in the sample
    idx = {
        r["video_id"]: sorted(r["idxs"])
        for r in frames.groupBy("video_id")
        .agg(F.collect_list("frame_idx").alias("idxs"))
        .collect()
    }
    for v, ids in idx.items():
        assert ids[0] == 0 and ids[-1] == meta[v] - 1
    with pytest.raises(ValueError, match="total"):
        extract_video_frames(videos, total=0)


from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    n_frames=st.integers(1, 6),
    fps=st.integers(1, 60),
    w=st.integers(8, 24),
    h=st.integers(8, 24),
)
@settings(max_examples=20, deadline=None)
def test_avi_roundtrip_property(n_frames, fps, w, h):
    """Container property gate: any frame count / fps / geometry roundtrips
    bit-exactly (the WAV codec has the same gate)."""
    rng = np.random.default_rng(n_frames * 1000 + fps)
    frames = [
        encode_jpeg(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    got_fps, out = demux_mjpeg_avi(encode_mjpeg_avi(frames, fps, w, h))
    assert got_fps == float(fps) and out == frames


def _valid_avi(seed: int, n_frames: int = 3) -> bytes:
    rng = np.random.default_rng(seed)
    frames = [
        encode_jpeg(rng.integers(0, 255, (12, 16, 3), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    return encode_mjpeg_avi(frames, 10, 16, 12)


@given(data=st.data())
@settings(max_examples=120, deadline=None)
def test_avi_fuzz_adversarial_containers_raise_cleanly(data):
    """Adversarial-container gate: ANY truncation or byte mutation of a valid
    AVI either still demuxes or raises a plain ``Exception`` subclass — never
    a BaseException the operator's quarantine (``video.py:78-79``) wouldn't
    catch, never a MemoryError from trusting a corrupt size field, never a
    hang. This is the S10 error-isolation contract at the container parser."""
    from video_features_spark.functions.avi import demux_video

    blob = bytearray(_valid_avi(data.draw(st.integers(0, 7))))
    mode = data.draw(st.sampled_from(["truncate", "mutate", "both"]))
    if mode in ("truncate", "both"):
        blob = blob[: data.draw(st.integers(0, len(blob)))]
    if mode in ("mutate", "both") and len(blob):
        for _ in range(data.draw(st.integers(1, 4))):
            pos = data.draw(st.integers(0, len(blob) - 1))
            blob[pos] = data.draw(st.integers(0, 255))
    try:
        fps, frames = demux_video(bytes(blob))
    except Exception:
        pass  # quarantine path: any Exception subclass is caught upstream
    except BaseException as e:  # noqa: BLE001
        raise AssertionError(
            f"demux raised a non-Exception {type(e).__name__}: the operator "
            "quarantine would not catch it"
        ) from e
    else:
        assert fps > 0
        assert all(isinstance(f, bytes) for f in frames)


def test_fuzzed_batch_quarantines_end_to_end(spark):
    """The same adversarial containers THROUGH ``extract_video_frames``:
    every input row must surface either as ≥1 decoded-frame row or as exactly
    one quarantine row — no input disappears, no task dies."""
    import pandas as pd

    from video_features_spark.operators.video import extract_video_frames

    rng = np.random.default_rng(99)
    rows = []
    for i in range(10):
        blob = bytearray(_valid_avi(i))
        if i % 3 == 1:
            blob = blob[: rng.integers(0, len(blob))]  # truncation
        elif i % 3 == 2:
            for _ in range(3):
                blob[rng.integers(0, len(blob))] = rng.integers(0, 256)  # bitrot
        rows.append(
            (f"v{i}", f"e{i % 2}", pd.Timestamp("2026-01-01").to_pydatetime(), bytes(blob))
        )
    df = spark.createDataFrame(
        rows, "video_id string, entity_id string, ts timestamp, video binary"
    )
    out = extract_video_frames(df).toPandas()
    for i in range(10):
        mine = out[out.video_id == f"v{i}"]
        bad = mine[mine.error.notna()]
        ok = mine[mine.error.isna()]
        assert (len(bad) == 1 and len(ok) == 0) or (len(bad) == 0 and len(ok) >= 1), (
            f"v{i}: {len(ok)} ok rows, {len(bad)} quarantine rows"
        )
