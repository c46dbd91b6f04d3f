"""Vectorized image preprocessing kernels (numpy), CLIP-transform semantics.

Re-implements the reference's transform pipeline as batch numpy ops used inside
pandas UDFs:
- ``resize``: smaller-edge scaling with bilinear or Catmull-Rom bicubic kernels
  and area-averaging antialias on downscale — semantics of
  ``models/transforms.py:76-96`` (``Resize``) / ``:191-242`` (``ResizeImproved``)
  in the reference.
- ``center_crop``: ``models/transforms.py:11-21,68-73``.
- ``normalize``: ``models/transforms.py:38-42,104-110``.
- ``clip_preprocess``: the canonical CLIP chain — Resize(BICUBIC, smaller edge)
  → CenterCrop → scale to [0,1] → Normalize(CLIP mean/std) — constants from
  ``/root/reference/models/clip/extract_clip.py:71-78`` (canonical copy at
  ``clip_src/clip.py:81-88``). These constants are part of the correctness
  contract; fixtures pin the output.

The interpolation kernel is pinned here (pure numpy) because the container has
no PIL; fixture generation and UDF execution share this single implementation,
so ``numpy.allclose`` holds regardless of Spark parallelism.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# CLIP normalization constants (reference extract_clip.py:76-77)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@lru_cache(maxsize=1024)
def _kernel_weights(n_in: int, n_out: int, kind: str) -> np.ndarray:
    """Dense (n_out, n_in) resampling matrix: separable kernel with scale-widened
    support on downscale (antialias), edge-clamped, rows normalized to 1.
    Memoized per (n_in, n_out, kind) — image sizes repeat heavily, and building
    the matrix otherwise dominates per-image preprocessing cost."""
    scale = n_in / n_out
    support = {"bilinear": 1.0, "bicubic": 2.0}[kind]
    width = support * max(scale, 1.0)
    centers = (np.arange(n_out) + 0.5) * scale - 0.5
    lo = np.floor(centers - width).astype(int)
    hi = np.ceil(centers + width).astype(int)
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        idx = np.arange(lo[i], hi[i] + 1)
        x = (idx - centers[i]) / max(scale, 1.0)
        if kind == "bilinear":
            wgt = np.maximum(0.0, 1.0 - np.abs(x))
        else:  # Catmull-Rom bicubic (Keys, a=-0.5)
            ax = np.abs(x)
            a = -0.5
            wgt = np.where(
                ax <= 1,
                (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
                np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
            )
        idx = np.clip(idx, 0, n_in - 1)  # clamp-to-edge
        s = wgt.sum()
        if s != 0:
            wgt = wgt / s
        np.add.at(mat[i], idx, wgt)
    out = mat.astype(np.float32)
    out.flags.writeable = False  # shared via the cache
    return out


def resize(
    arr: np.ndarray,
    size: int,
    kind: str = "bicubic",
    smaller_edge: bool = True,
) -> np.ndarray:
    """Resize H×W×3 so the smaller edge equals ``size`` (aspect preserved), or
    to ``size``×``size`` when ``smaller_edge=False``. Returns float32."""
    h, w = arr.shape[:2]
    if smaller_edge:
        if h <= w:
            nh, nw = size, max(1, round(w * size / h))
        else:
            nh, nw = max(1, round(h * size / w)), size
    else:
        nh = nw = size
    # Separable resample as two BLAS matmuls (einsum's c_einsum path is ~5x
    # slower and dominated the per-image cost). The contraction is written as
    # A(m,k) @ W.T(k,n) with n = the FIXED output size: BLAS kernel choice (and
    # with it the k-accumulation order) depends on n, so keeping n fixed makes
    # the result bit-identical whether one image or a whole size-group batch
    # rides in m — the property resize_batch and the determinism tests rely on.
    return _resize_nhwc(arr[None].astype(np.float32), h, w, nh, nw, kind)[0]


# Fixed m per BLAS call — see _tiled_matmul. Any constant works for the
# determinism contract (the kernel choice varies with m, not with row
# position); 1024 keeps the pad-to-tile waste negligible for the small
# per-Arrow-batch calls the Spark UDFs make (~80-500 rows/partition at bench
# scale), where 8192 taxed every call with a mostly-padding GEMM (measured
# ~3.5 ms/img at batch=80 on the 224px model). Values are unchanged: OpenBLAS
# sgemm rounding here is identical for m=1024 vs 8192 (verified bit-exact on
# the embed/resize shapes), and the determinism tests gate it.
_GEMM_TILE = 1024


def _tiled_matmul(t: np.ndarray, wt: np.ndarray) -> np.ndarray:
    """``t @ wt`` computed in zero-padded tiles of EXACTLY ``_GEMM_TILE`` rows.

    BLAS picks different kernels (different k-accumulation order, hence
    different last-bit rounding) depending on the m dimension. Fixing every
    call to one m makes each output row bit-identical no matter how many
    images share the batch — the property the cross-partitioning determinism
    contract needs. Rows of C depend only on their own row of A, so the
    zero padding never leaks into results."""
    m = t.shape[0]
    out = np.empty((m, wt.shape[1]), np.float32)
    pad = np.zeros((_GEMM_TILE, t.shape[1]), np.float32)
    for i in range(0, m, _GEMM_TILE):
        chunk = t[i : i + _GEMM_TILE]
        if len(chunk) == _GEMM_TILE:
            out[i : i + _GEMM_TILE] = chunk @ wt
        else:
            pad[: len(chunk)] = chunk
            pad[len(chunk) :] = 0.0
            out[i : i + len(chunk)] = (pad @ wt)[: len(chunk)]
    return out


def _resize_nhwc(
    a: np.ndarray, h: int, w: int, nh: int, nw: int, kind: str
) -> np.ndarray:
    """B×H×W×3 float32 → B×nh×nw×3; batch rides the GEMM's m dimension only."""
    b = a.shape[0]
    if nh != h:
        t = np.ascontiguousarray(a.transpose(0, 2, 3, 1)).reshape(b * w * 3, h)
        a = _tiled_matmul(t, _kernel_weights(h, nh, kind).T).reshape(b, w, 3, nh).transpose(0, 3, 1, 2)
    if nw != w:
        t = np.ascontiguousarray(a.transpose(0, 1, 3, 2)).reshape(b * nh * 3, w)
        a = _tiled_matmul(t, _kernel_weights(w, nw, kind).T).reshape(b, nh, 3, nw).transpose(0, 1, 3, 2)
    return np.ascontiguousarray(a)


def resize_batch(
    batch: np.ndarray, size: int, kind: str = "bicubic", smaller_edge: bool = True
) -> np.ndarray:
    """Vectorized ``resize`` for a B×H×W×3 stack of SAME-size images: the two
    separable matmuls run once over the whole batch (k-dim and accumulation
    order identical to the per-image path, so results are bit-equal — gated by
    tests). ~5-10x faster than a per-image loop."""
    b, h, w = batch.shape[:3]
    if smaller_edge:
        if h <= w:
            nh, nw = size, max(1, round(w * size / h))
        else:
            nh, nw = max(1, round(h * size / w)), size
    else:
        nh = nw = size
    return _resize_nhwc(batch.astype(np.float32), h, w, nh, nw, kind)


def clip_preprocess_batch(batch: np.ndarray, size: int = 224) -> np.ndarray:
    """Vectorized ``clip_preprocess`` for same-size images (B×H×W×3 uint8 →
    B×size×size×3 float32)."""
    a = resize_batch(batch, size, kind="bicubic", smaller_edge=True)
    _, h, w = a.shape[:3]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        a = np.pad(
            a,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            mode="edge",
        )
        _, h, w = a.shape[:3]
    i, j = (h - size) // 2, (w - size) // 2
    a = a[:, i : i + size, j : j + size]
    a = a / np.float32(255.0)
    return ((a - CLIP_MEAN.reshape(1, 1, 1, 3)) / CLIP_STD.reshape(1, 1, 1, 3)).astype(np.float32)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    """Centered ``size``×``size`` crop (pads by edge-replication if smaller —
    the reference asserts inputs are large enough; we stay total)."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        arr = np.pad(
            arr,
            ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            mode="edge",
        )
        h, w = arr.shape[:2]
    i, j = (h - size) // 2, (w - size) // 2
    return arr[i : i + size, j : j + size]


def normalize(arr: np.ndarray, mean: np.ndarray = CLIP_MEAN, std: np.ndarray = CLIP_STD) -> np.ndarray:
    return (arr - mean.reshape(1, 1, 3)) / std.reshape(1, 1, 3)


def clip_preprocess(arr: np.ndarray, size: int = 224) -> np.ndarray:
    """CLIP preprocessing chain → float32 ``size×size×3`` normalized tensor."""
    a = resize(arr, size, kind="bicubic", smaller_edge=True)
    a = center_crop(a, size)
    a = a / np.float32(255.0)
    return normalize(a).astype(np.float32)


def pad_to_multiple(
    arr: np.ndarray, multiple: int = 8, mode: str = "edge"
) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """P14: pad H and W up to the next multiple of ``multiple`` (split across
    both sides, edge-replicated) — the reference flow models require /8 inputs
    and unpad afterwards (``/root/reference/models/raft/raft_src/raft.py:30-48``,
    InputPadder). Returns (padded, (top, bottom, left, right)) so ``unpad``
    can restore the original geometry exactly."""
    h, w = arr.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    pads = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
    if ph or pw:
        spec = [(pads[0], pads[1]), (pads[2], pads[3])] + [(0, 0)] * (arr.ndim - 2)
        arr = np.pad(arr, spec, mode=mode)
    return arr, pads


def unpad(arr: np.ndarray, pads: tuple[int, int, int, int]) -> np.ndarray:
    """Inverse of ``pad_to_multiple``: slice the padding back off."""
    t, b, l, r = pads
    return arr[t : arr.shape[0] - b or None, l : arr.shape[1] - r or None]


def augment_deterministic(img: "np.ndarray", key: int) -> "np.ndarray":
    """P12 re-expressed reproducibly: horizontal flip + brightness jitter whose
    randomness is a pure function of ``key`` (e.g. crc32 of the row id). The
    reference's torchvision RandomHorizontalFlip/jitter is nondeterministic
    across runs — useless in a resumable pipeline where a retried partition
    must reproduce its rows bit-exactly; keying the draw by row identity keeps
    augmentation diversity AND the checkpoint/resume contract."""
    rng = np.random.default_rng(key & 0x7FFFFFFFFFFFFFFF)
    out = img
    if rng.random() < 0.5:
        out = out[:, ::-1]
    scale = np.float32(1.0 + rng.uniform(-0.1, 0.1))
    return np.clip(out.astype(np.float32) * scale, 0, 255).astype(np.uint8)
