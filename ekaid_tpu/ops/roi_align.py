"""ROIAlign: bilinear ROI pooling over FPN feature maps.

TPU-native replacement for Detectron2's C++/CUDA ROIAlignV2
(SURVEY.md §2.3; the reference probes it at ana_bbox_generator.py:540-546
`ROIPooler((7,7), [0.25,...], 'ROIAlignV2')`). Semantics follow
ROIAlignV2 ("aligned=True"): box coordinates are shifted by -0.5 pixel
(continuous coordinate convention), each output bin averages a fixed
`sampling_ratio × sampling_ratio` grid of bilinear samples.

Two implementations:
  * `roi_align` — pure-jnp gather formulation: builds all sample
    coordinates, gathers the 4 neighbors per sample with one batched
    gather, lerps, averages. XLA fuses this into a handful of kernels;
    it is the reference semantics and the autodiff path.
  * a Pallas double-buffered variant lives in ekaid_tpu.ops.pallas_roi
    for the extraction hot path (feature maps stay in HBM; per-ROI tiles
    are DMA'd into VMEM).

Multi-level pooling (`multilevel_roi_align`) assigns each ROI to an FPN
level with the canonical heuristic level = floor(k0 + log2(sqrt(area)/224))
clamped to the pyramid (Detectron2 ROIPooler semantics), then pools every
level and selects — full dense compute on all levels, which on TPU is
cheaper than data-dependent partitioning.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


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


def multilevel_roi_align(fmaps: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         scales: Sequence[float], out_size: int = 7,
                         sampling_ratio: int = 2,
                         min_level: int = 2) -> jnp.ndarray:
    """fmaps: list of [H_l, W_l, C] (p2..p5); rois [R, 4] ->
    [R, out, out, C]. Pools every level densely and selects per ROI."""
    levels = assign_levels(rois, min_level=min_level,
                           max_level=min_level + len(fmaps) - 1)
    pooled = [roi_align(f, rois, s, out_size, sampling_ratio)
              for f, s in zip(fmaps, scales)]
    stacked = jnp.stack(pooled, axis=0)              # [L, R, out, out, C]
    sel = (levels - min_level)[None, :, None, None, None]
    lvl_iota = jnp.arange(len(fmaps))[:, None, None, None, None]
    return jnp.sum(jnp.where(lvl_iota == sel, stacked, 0.0), axis=0)
