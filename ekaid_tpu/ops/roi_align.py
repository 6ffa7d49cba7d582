"""ROIAlign: bilinear ROI pooling over FPN feature maps.

TPU-native replacement for Detectron2's C++/CUDA ROIAlignV2
(SURVEY.md §2.3; the reference probes it at ana_bbox_generator.py:540-546
`ROIPooler((7,7), [0.25,...], 'ROIAlignV2')`). Semantics follow
ROIAlignV2 ("aligned=True"): box coordinates are shifted by -0.5 pixel
(continuous coordinate convention), each output bin averages a fixed
`sampling_ratio × sampling_ratio` grid of bilinear samples.

Implementation: a pure-jnp gather formulation — build all sample
coordinates, gather the 4 neighbors per sample with one batched gather,
lerp, average. XLA fuses this into a handful of kernels; it is the
reference semantics and the autodiff path. (A Pallas tile-DMA variant
was evaluated and REJECTED on bandwidth math: with C=256 a 64×64 VMEM
tile per ROI moves ~2 GB/image vs ~0.4 GB for this sparse gather —
docs/STATUS.md round 1.)

Multi-level pooling (`multilevel_roi_align`) assigns each ROI to an FPN
level with the canonical heuristic level = floor(k0 + log2(sqrt(area)/224))
clamped to the pyramid (Detectron2 ROIPooler semantics), then flattens
all levels into one row table and pools each ROI with a single gather
against its level's offset — no dense pool-all-levels pass (the earlier
dense formulation OOM'd training at 29 GB). The gather tail is shaped
by measured v5e HBM behavior — feature-dtype temps, matmul-folded
sample averaging, chunked ROIs (see multilevel_roi_align docstring);
the f32 6-D-reshape formulation OOM'd batch-32 extraction at 33 GB
with 73× tile-padding.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(fmap: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """fmap [H, W, C]; ys/xs [...] continuous coords -> [..., C]."""
    h, w = fmap.shape[0], fmap.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def at(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return fmap[yc, xc]

    # out-of-range samples contribute zero (ROIAlign convention:
    # samples with y < -1 or y > H are zeroed; borderline clamped)
    v = (at(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
         + at(y0, x0 + 1) * ((1 - ly) * lx)[..., None]
         + at(y0 + 1, x0) * (ly * (1 - lx))[..., None]
         + at(y0 + 1, x0 + 1) * (ly * lx)[..., None])
    inside = ((ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w))
    return jnp.where(inside[..., None], v, 0.0)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio"))
def roi_align(fmap: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              out_size: int = 7, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """fmap [H, W, C]; rois [R, 4] (x1, y1, x2, y2) in image coords ->
    [R, out_size, out_size, C]."""
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    s = sampling_ratio
    bin_h = roi_h / out_size                         # [R]
    bin_w = roi_w / out_size
    # sample grid: per bin, s×s points at (i + (j+0.5)/s) * bin
    bins = jnp.arange(out_size, dtype=fmap.dtype)
    sub = (jnp.arange(s, dtype=fmap.dtype) + 0.5) / s
    # [out, s] offsets in bin units
    grid = bins[:, None] + sub[None, :]
    ys = y1[:, None, None] + bin_h[:, None, None] * grid[None]  # [R,out,s]
    xs = x1[:, None, None] + bin_w[:, None, None] * grid[None]
    # full sample lattice [R, out, s, out, s]
    ys_full = ys[:, :, :, None, None]
    xs_full = xs[:, None, None, :, :]
    ys_b, xs_b = jnp.broadcast_arrays(ys_full, xs_full)
    vals = _bilinear_gather(fmap, ys_b, xs_b)        # [R,out,s,out,s,C]
    return jnp.mean(vals, axis=(2, 4))               # [R,out,out,C]


def assign_levels(rois: jnp.ndarray, min_level: int = 2,
                  max_level: int = 5, canonical_size: float = 224.0,
                  canonical_level: int = 4) -> jnp.ndarray:
    """FPN level per ROI (Detectron2 ROIPooler heuristic)."""
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 0.0)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 0.0)
    size = jnp.sqrt(w * h)
    lvl = jnp.floor(canonical_level
                    + jnp.log2(jnp.maximum(size, 1e-6) / canonical_size))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def _auto_chunk(r: int, target: int = 256) -> int:
    """Chunk size for r ROIs: the fixed target when chunking pays
    (r > target), else 0. Non-divisible r is PADDED up by the caller —
    a divisor search here degenerated to chunk 1–2 for prime-ish r,
    turning one pooling into an R-step lax.map (the axon remote
    compiler takes >10 min on 1000-step sequential loops)."""
    return target if r > target else 0


def multilevel_roi_align(fmaps: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         scales: Sequence[float], out_size: int = 7,
                         sampling_ratio: int = 2,
                         min_level: int = 2,
                         roi_chunk: int | None = None) -> jnp.ndarray:
    """fmaps: list of [H_l, W_l, C] (p2..p5); rois [R, 4] ->
    [R, out, out, C].

    Single-gather formulation: all pyramid levels are flattened into one
    [sum(H_l*W_l), C] table; each ROI's sample coordinates are computed
    against its assigned level and indexed with that level's row offset.
    One gather instead of pooling every level densely (4x less compute
    and — critically for the training backward — 4x less live memory
    than the pool-all-and-select formulation).

    TPU memory discipline (measured on v5e, batch-32 extract at 1024²):
      * gathers and lerp weights stay in the feature dtype — converting
        to f32 doubled the corner-gather temps to 4×5.98 GB;
      * the s×s sample average is folded into two tiny [out, out*s]
        matmuls (P·v·Pᵀ) instead of a reshape to [R,out,s,out,s,C]
        whose (s,s)-trailing layout tile-pads 73× in HLO temps;
      * ROIs are processed in `roi_chunk` blocks under lax.map
        (roi_chunk=None chunks at 256, padding R up to a multiple —
        the trip count stays ~R/256 for ANY R; 0 disables), bounding
        the live gather set.
    """
    s = sampling_ratio
    os_ = out_size * s
    C = fmaps[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in fmaps], axis=0)
    heights = jnp.asarray([f.shape[0] for f in fmaps])
    widths = jnp.asarray([f.shape[1] for f in fmaps])
    offsets = jnp.asarray(
        [0] + list(np.cumsum([f.shape[0] * f.shape[1]
                              for f in fmaps]))[:-1])
    scale_arr = jnp.asarray(scales, jnp.float32)
    max_level = min_level + len(fmaps) - 1
    dt = flat.dtype
    # s×s-sample mean folded into [out, out*s] averaging matmuls
    pmat_np = np.zeros((out_size, os_), np.float32)
    for b in range(out_size):
        pmat_np[b, b * s:(b + 1) * s] = 1.0 / s
    pmat = jnp.asarray(pmat_np, dt)

    def pool(rois):
        levels = assign_levels(rois, min_level=min_level,
                               max_level=max_level)
        lvl_idx = levels - min_level                 # [R] in [0, L)
        r_scale = scale_arr[lvl_idx]                 # [R]
        r_h = heights[lvl_idx]
        r_w = widths[lvl_idx]
        r_off = offsets[lvl_idx]

        x1 = rois[:, 0] * r_scale - 0.5
        y1 = rois[:, 1] * r_scale - 0.5
        roi_w = (rois[:, 2] - rois[:, 0]) * r_scale
        roi_h = (rois[:, 3] - rois[:, 1]) * r_scale

        bins = jnp.arange(out_size, dtype=jnp.float32)
        sub = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        grid = (bins[:, None] + sub[None, :]).reshape(-1)   # [out*s]
        ys = y1[:, None] + (roi_h / out_size)[:, None] * grid[None]
        xs = x1[:, None] + (roi_w / out_size)[:, None] * grid[None]

        ys_b = ys[:, :, None]                        # [R, os, 1]
        xs_b = xs[:, None, :]                        # [R, 1, os]
        y0 = jnp.floor(ys_b)
        x0 = jnp.floor(xs_b)
        ly = ys_b - y0
        lx = xs_b - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        h = r_h[:, None, None]
        w = r_w[:, None, None]
        off = r_off[:, None, None]

        def flat_at(yi, xi):
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            return flat[off + yc * w + xc]           # [R, os, os, C]

        w00 = ((1 - ly) * (1 - lx)).astype(dt)
        w01 = ((1 - ly) * lx).astype(dt)
        w10 = (ly * (1 - lx)).astype(dt)
        w11 = (ly * lx).astype(dt)
        v = (flat_at(y0i, x0i) * w00[..., None]
             + flat_at(y0i, x0i + 1) * w01[..., None]
             + flat_at(y0i + 1, x0i) * w10[..., None]
             + flat_at(y0i + 1, x0i + 1) * w11[..., None])
        inside = ((ys_b >= -1.0) & (ys_b <= h)
                  & (xs_b >= -1.0) & (xs_b <= w))
        v = jnp.where(inside[..., None], v, jnp.zeros((), dt))
        t = jnp.einsum("pa,rabc->rpbc", pmat, v)     # avg sample rows
        return jnp.einsum("qb,rpbc->rpqc", pmat, t)  # avg sample cols

    r = rois.shape[0]
    chunk = _auto_chunk(r) if roi_chunk is None else roi_chunk
    if chunk and chunk < r:
        pad = (-r) % chunk                  # bound the trip count: pad
        rp = jnp.concatenate(               # instead of divisor-hunting
            [rois, jnp.zeros((pad, 4), rois.dtype)]) if pad else rois
        out = jax.lax.map(pool, rp.reshape(-1, chunk, 4))
        return out.reshape(r + pad, out_size, out_size, C)[:r]
    return pool(rois)
