"""Shared ffmpeg-subprocess scaffold for the compressed-media adapters.

One temp-file transcode helper used by both the audio seam
(``wav.ffmpeg_to_wav``) and the video seam (``avi.ffmpeg_to_mjpeg_avi``) —
the reference shells out to ffmpeg the same way
(``/root/reference/utils/utils.py:194-223``). Output goes via a temp file,
never a stdout pipe: WAV and AVI headers both need a seekable sink.
"""

from __future__ import annotations

import os
import subprocess
import tempfile


def has_ffmpeg() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def transcode(data: bytes, out_args: list[str], suffix: str, timeout: int) -> bytes:
    """stdin bytes → ffmpeg with ``out_args`` → bytes of the temp output file.
    Raises ValueError (the adapters' quarantine contract) on any failure."""
    fd, path = tempfile.mkstemp(suffix=suffix)
    os.close(fd)
    try:
        proc = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", "pipe:0", *out_args, "-y", path],
            input=data, capture_output=True, timeout=timeout,
        )
        if proc.returncode != 0:
            raise ValueError(
                f"ffmpeg transcode failed: {proc.stderr.decode(errors='replace')[-200:]}"
            )
        with open(path, "rb") as f:
            return f.read()
    except subprocess.TimeoutExpired as e:
        raise ValueError(f"ffmpeg transcode timed out after {timeout}s") from e
    finally:
        os.unlink(path)
