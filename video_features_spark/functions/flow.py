"""Coarse dense optical-flow field between two frames.

The reference's RAFT head emits a dense ``2 x H x W`` flow field per
consecutive-frame pair, upsampled from a 1/8-resolution estimate
(``/root/reference/models/raft/raft_src/raft.py:118-177``; rendered by
``utils/flow_viz.py``). This module matches that OUTPUT SEMANTICS — a per-pair
2-channel motion grid at 1/8-style coarse resolution — with a deterministic
gradient-based estimator standing in for the learned weights (torch is absent
in this environment; the learned-model seam is ``functions/embed.py``).

Estimator: normal flow (Lucas-Kanade-lite). Both frames are block-mean
downsampled to a ``grid x grid`` luminance plane (this also makes mixed-size
pairs legal, like the pair-embedding path), then per cell

    flow = -It * grad(I) / (|grad(I)|^2 + eps)

with spatial gradients from the first frame and It the temporal difference.
Pure element-wise numpy (no GEMM), so the result is bit-identical across BLAS
thread counts — per-row batch-invariant by construction.
"""

from __future__ import annotations

import numpy as np


def _block_lum(img: np.ndarray, grid: int) -> np.ndarray:
    """Block-mean luminance downsample to (grid, grid) float64. Cell edges via
    integer linspace so any HxW maps deterministically onto the grid."""
    if img.ndim == 3:
        lum = img.astype(np.float64).mean(axis=2)
    else:
        lum = img.astype(np.float64)
    h, w = lum.shape
    if h < grid or w < grid:
        raise ValueError(f"frame {h}x{w} smaller than {grid}x{grid} flow grid")
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.empty((grid, grid), dtype=np.float64)
    for i in range(grid):
        for j in range(grid):
            out[i, j] = lum[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    return out


def pair_flow_field(
    a: np.ndarray, b: np.ndarray, grid: int = 8, eps: float = 1e-3
) -> np.ndarray:
    """Dense coarse flow field for the frame pair (a -> b): float32 array of
    shape (2, grid, grid) — channel 0 = horizontal (x) flow, channel 1 =
    vertical (y), in cell units. See module docstring for the estimator."""
    la = _block_lum(a, grid)
    lb = _block_lum(b, grid)
    gy, gx = np.gradient(la)
    it = lb - la
    denom = gx * gx + gy * gy + eps
    u = -it * gx / denom
    v = -it * gy / denom
    return np.stack([u, v]).astype(np.float32)


def flow_colorwheel() -> np.ndarray:
    """The published optical-flow color wheel (Baker et al., "A Database and
    Evaluation Methodology for Optical Flow", ICCV'07): 55 hues in six ramp
    segments RY/YG/GC/CB/BM/MR of sizes 15/6/4/11/13/6. Independent
    implementation of the published spec — the reference ships Tom Runia's
    MIT version of the same wheel (``utils/flow_viz.py``), not copied here.
    Returns (55, 3) float64 in [0, 1]."""
    segs = ((15, 0, 1), (6, 1, 0), (4, 1, 2), (11, 2, 1), (13, 2, 0), (6, 0, 2))
    rows = []
    for n, hold, ramp in segs:
        block = np.zeros((n, 3))
        block[:, hold] = 1.0
        block[:, ramp] = np.arange(n) / n
        rows.append(block)
    wheel = np.concatenate(rows)
    # ramp direction alternates: odd segments fade the PREVIOUS hold channel
    for si, (n, hold, ramp) in enumerate(segs):
        if si % 2 == 1:
            start = sum(s[0] for s in segs[:si])
            wheel[start : start + n, ramp] = 1.0 - np.arange(n) / n
            wheel[start : start + n, hold] = 1.0
    return wheel


def flow_to_rgb(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """(2, H, W) flow field → (H, W, 3) uint8 visualization with the
    published angle→hue, magnitude→saturation mapping (the semantics of the
    reference's ``flow_viz.flow_to_image``): zero motion renders white,
    direction picks the wheel hue, saturation grows with magnitude
    (normalized by ``max_mag`` or the field's own max)."""
    u, v = np.asarray(flow[0], np.float64), np.asarray(flow[1], np.float64)
    mag = np.sqrt(u * u + v * v)
    denom = max_mag if max_mag else max(float(mag.max()), 1e-9)
    rad = np.clip(mag / denom, 0.0, 1.0)
    wheel = flow_colorwheel()
    ncols = len(wheel)
    ang = np.arctan2(-v, -u) / np.pi           # [-1, 1]
    fk = (ang + 1.0) / 2.0 * (ncols - 1)
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = (fk - np.floor(fk))[..., None]
    col = (1.0 - f) * wheel[k0] + f * wheel[k1]
    col = 1.0 - rad[..., None] * (1.0 - col)   # desaturate toward white at 0
    return np.clip(col * 255.0 + 0.5, 0, 255).astype(np.uint8)
