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
