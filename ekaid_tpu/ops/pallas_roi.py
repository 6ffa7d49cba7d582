"""Pallas TPU kernel: multilevel ROIAlign via per-ROI patch DMA.

Replaces the XLA scattered row-gather in ops/roi_align.py's
`multilevel_roi_align` (784 independent 512-byte row gathers per ROI,
measured 5.5 ms for 1000 ROIs at C=256 bf16 on v5e) with one
contiguous patch DMA per ROI plus two tiny matmuls — measured 2.7 ms
on the same workload (scripts/bench_roi.py A/B):

* The FPN level-assignment heuristic (assign_levels) guarantees every
  ROI spans ~[14, 46] px at its assigned level (size·2^-lvl ∈
  [224,448)/16, clamped at p2/p5), so the ROI's whole bilinear support
  fits a fixed 48-row × 56-col patch — one strided DMA per ROI.
* Bilinear interpolation + the s×s sample average collapse into
  out = A · patch · Bᵀ, where A/B are [out, PATCH] triangular-hat
  weight matrices (relu(1−|y_sample−row|) is exactly the 2-tap
  bilinear kernel) pre-multiplied by the bin-averaging matrix —
  built in-kernel from iota arithmetic (the TPU lowering has no
  dynamic_slice on values) and run on the MXU.
* Grid steps process `GROUP` ROIs each with double-buffered DMAs: the
  next group's patches stream in while the current group computes
  (the guide's double-buffer pattern; ref indexing with a dynamic
  slot is the sanctioned form).
* Patch x-origin is aligned down to a multiple of 8 and the x-extent
  widened to 56: the level maps are [..., H, W, C] with W the
  sublane-tiled dim (tile 8), and Mosaic requires HBM slice offsets in
  tiled dims to be provably tile-aligned (`pl.multiple_of` states the
  fact; the host wrapper establishes it). The H dim is untiled — y
  needs no alignment.
* Batched: level maps may carry a leading image dim; each ROI's row in
  the scalar-prefetched meta carries its image index, so one kernel
  call pools every ROI of the whole batch (the inference path pools
  B×R ROIs in one call — no per-image vmap).

Coordinate handling matches the XLA path: sample coords clamp to
[0, H−1] (a clamped sample's two taps land on the same row, and the
hat weight there is exactly 1 — and exactly 0 on the out-of-patch
neighbor, so stale scratch rows beyond a small level map contribute
nothing), and samples outside [−1, H] zero their weight rows.

VMEM budget: patches scratch is 2·GROUP·48·56·C at the feature dtype —
11 MB for C=256 bf16 (the extraction path); f32 feature maps halve
GROUP to fit.

No autodiff: extraction/inference only — the training path keeps the
differentiable XLA gather (ops/roi_align.py).

Equivalence vs multilevel_roi_align: tests/test_detector_ops.py::
test_pallas_roi_matches_xla (interpret mode); on-chip A/B in
scripts/bench_roi.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ekaid_tpu.ops.roi_align import assign_levels

PATCH_Y = 48      # ≥ max ROI span at its level (+1 bilinear, +1 floor)
PATCH_X = 56      # span + 7 px worst-case 8-alignment slack, 8-aligned


def _make_kernel(out_size: int, sampling_ratio: int, num_levels: int,
                 heights: tuple, group: int):
    s = sampling_ratio
    os_ = out_size * s

    def kernel(meta_s, fmeta_s, *rest):
        lvl_maps = rest[:num_levels]
        out_ref, patches, sems = rest[num_levels:]
        g = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def dma(step, slot, j, start):
            r = step * group + j
            img = meta_s[4 * r + 0]
            lvl = meta_s[4 * r + 1]
            for li in range(num_levels):
                p_ly = min(PATCH_Y, heights[li])
                p_lx = min(PATCH_X, heights[li])

                @pl.when(lvl == li)
                def _(li=li, p_ly=p_ly, p_lx=p_lx):
                    cp = pltpu.make_async_copy(
                        lvl_maps[li].at[img,
                                        pl.ds(meta_s[4 * r + 2], p_ly),
                                        pl.ds(pl.multiple_of(
                                            meta_s[4 * r + 3], 8),
                                            p_lx), :],
                        patches.at[slot, j, pl.ds(0, p_ly),
                                   pl.ds(0, p_lx), :],
                        sems.at[slot, j],
                    )
                    if start:
                        cp.start()
                    else:
                        cp.wait()
                        # zero the margins the DMA didn't fill: weights
                        # there are exactly 0, but 0 × uninit(NaN)
                        # would poison the pooling matmul
                        c = patches.shape[-1]
                        if p_ly < PATCH_Y:
                            patches[slot, j, p_ly:, :, :] = jnp.zeros(
                                (PATCH_Y - p_ly, PATCH_X, c),
                                patches.dtype)
                        if p_lx < PATCH_X:
                            patches[slot, j, :p_ly, p_lx:, :] = jnp.zeros(
                                (p_ly, PATCH_X - p_lx, c),
                                patches.dtype)

        @pl.when(g == 0)
        def _():
            for j in range(group):
                dma(0, 0, j, start=True)

        @pl.when(g + 1 < n_steps)
        def _():
            for j in range(group):
                dma(g + 1, (g + 1) % 2, j, start=True)

        for j in range(group):
            dma(g, g % 2, j, start=False)

        # bin-averaging matrix and sample-offset grid from iota
        # (tpu.iota is integer-only: build int32, cast after)
        bin_i = jax.lax.broadcasted_iota(jnp.int32, (out_size, os_), 0)
        samp_i = jax.lax.broadcasted_iota(jnp.int32, (out_size, os_), 1)
        pavg = jnp.where(samp_i // s == bin_i, 1.0 / s, 0.0)
        iota_os_i = jax.lax.broadcasted_iota(jnp.int32, (os_, 1), 0)
        iota_py = jax.lax.broadcasted_iota(
            jnp.int32, (os_, PATCH_Y), 1).astype(jnp.float32)
        iota_px = jax.lax.broadcasted_iota(
            jnp.int32, (os_, PATCH_X), 1).astype(jnp.float32)
        # offsets in bin units: i//s + (i%s + 0.5)/s, shaped [os, 1]
        grid = ((iota_os_i // s).astype(jnp.float32)
                + ((iota_os_i % s).astype(jnp.float32) + 0.5) / s)

        for j in range(group):
            r = g * group + j
            y1r = fmeta_s[8 * r + 0]
            x1r = fmeta_s[8 * r + 1]
            bh = fmeta_s[8 * r + 2]
            bw = fmeta_s[8 * r + 3]
            yhi = fmeta_s[8 * r + 4]
            xhi = fmeta_s[8 * r + 5]
            ysf = fmeta_s[8 * r + 6]
            xsf = fmeta_s[8 * r + 7]

            def hat(origin, binsz, hi, start_f, iota_p):
                raw = origin + binsz * grid             # [os, 1] rel
                absc = raw + start_f
                full = hi + start_f + 1.0               # = H (or W)
                ins = ((absc >= -1.0)
                       & (absc <= full)).astype(jnp.float32)
                cl = jnp.clip(raw, 0.0, hi)
                w = jnp.maximum(0.0, 1.0 - jnp.abs(cl - iota_p)) * ins
                return jnp.dot(pavg, w)                 # [out, PATCH_*]

            a_y = hat(y1r, bh, yhi, ysf, iota_py)
            b_x = hat(x1r, bw, xhi, xsf, iota_px)

            patch = patches[g % 2, j].astype(jnp.float32)  # [Py, Px, C]
            c = patch.shape[-1]
            t = jnp.dot(a_y, patch.reshape(PATCH_Y, PATCH_X * c))
            t = t.reshape(out_size, PATCH_X, c)
            o = jax.lax.dot_general(b_x, t,
                                    (((1,), (1,)), ((), ())))
            # o: [out_x, out_y, C] -> [out_y, out_x, C]
            out_ref[j] = o.transpose(1, 0, 2).astype(out_ref.dtype)

    return kernel


def multilevel_roi_align_pallas(fmaps: Sequence[jnp.ndarray],
                                rois: jnp.ndarray,
                                scales: Sequence[float],
                                out_size: int = 7,
                                sampling_ratio: int = 2,
                                min_level: int = 2,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in for multilevel_roi_align (same contract), plus batched:

    * fmaps [H, W, C] per level + rois [R, 4]   -> [R, out, out, C]
    * fmaps [B, H, W, C] per level + rois [B, R, 4]
                                                -> [B, R, out, out, C]
    Level maps must be square (they are: square input images).
    """
    batched = rois.ndim == 3
    if not batched:
        fmaps = [f[None] for f in fmaps]
        rois = rois[None]
    b, r_per = rois.shape[0], rois.shape[1]

    # SMEM holds the prefetched per-ROI tables (~48 B/ROI flat); past
    # ~16k ROIs it overflows the ~2 MB budget — chunk with lax.map
    # (sequential kernel calls, same outputs): first the ROI dim (also
    # covers a single image with >16k ROIs), then whole images
    max_rois = 16384
    if r_per > max_rois:
        rc = max_rois
        pad_r = (-r_per) % rc
        rp = jnp.concatenate(
            [rois, jnp.zeros((b, pad_r, 4), rois.dtype)],
            axis=1) if pad_r else rois
        blocks = jnp.swapaxes(rp.reshape(b, -1, rc, 4), 0, 1)

        def one_blk(blk):
            return multilevel_roi_align_pallas(
                list(fmaps), blk, scales, out_size=out_size,
                sampling_ratio=sampling_ratio, min_level=min_level,
                interpret=interpret)

        out = jax.lax.map(one_blk, blocks)     # [k, b, rc, o, o, C]
        out = jnp.swapaxes(out, 0, 1).reshape(
            b, -1, out_size, out_size,
            fmaps[0].shape[-1])[:, :r_per]
        return out if batched else out[0]
    if b * r_per > max_rois and b > 1:
        bc = max(1, max_rois // max(r_per, 1))
        while b % bc:
            bc -= 1
        if bc < b:
            fm = tuple(f.reshape(b // bc, bc, *f.shape[1:])
                       for f in fmaps)
            rr = rois.reshape(b // bc, bc, r_per, 4)

            def one(args):
                return multilevel_roi_align_pallas(
                    list(args[0]), args[1], scales, out_size=out_size,
                    sampling_ratio=sampling_ratio, min_level=min_level,
                    interpret=interpret)

            out = jax.lax.map(one, (fm, rr))   # b>1 implies batched
            return out.reshape(b, r_per, out_size, out_size,
                               fmaps[0].shape[-1])
    s = sampling_ratio
    num_levels = len(fmaps)
    heights = tuple(int(f.shape[1]) for f in fmaps)
    for f in fmaps:
        assert f.shape[1] == f.shape[2], "level maps must be square"
    for h in heights:
        # the x-start align-down below (xs = floor(clip(...)/8)*8)
        # preserves the right-edge guarantee only when W - PATCH_X is a
        # multiple of the 8-wide sublane tile; otherwise right-edge-
        # clamped samples would read outside the loaded patch and pool
        # zeros SILENTLY (ADVICE r2). True for power-of-two-ish FPN maps
        # (200/72/8); reject odd geometries toward the XLA backend.
        assert (h - min(PATCH_X, h)) % 8 == 0, (
            f"level width {h}: W - PATCH_X must be 8-aligned for the "
            "pallas roi backend — use roi_backend='xla' for this "
            "geometry")
    C = fmaps[0].shape[-1]
    dt = fmaps[0].dtype
    # f32 patches double the scratch: halve GROUP to stay in VMEM
    group = 4 if dt.itemsize <= 2 else 2

    flat_rois = rois.reshape(-1, 4)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r_per)
    r = flat_rois.shape[0]
    pad = (-r) % group
    if pad:
        flat_rois = jnp.concatenate(
            [flat_rois, jnp.zeros((pad, 4), flat_rois.dtype)], axis=0)
        img_idx = jnp.concatenate(
            [img_idx, jnp.zeros((pad,), jnp.int32)], axis=0)
        r += pad

    levels = assign_levels(flat_rois, min_level=min_level,
                           max_level=min_level + num_levels - 1)
    lvl_idx = levels - min_level

    # Elongated-ROI fit bump (DOCUMENTED DEVIATION, docs/PARITY.md):
    # assign_levels bounds sqrt(w*h) only, so a box whose LONG SIDE at
    # its assigned level exceeds the 44 px cap can span more pixels
    # there than the fixed patch holds — which would silently zero the
    # overflowed columns. (The trigger is the 44 px cap itself, not an
    # aspect threshold: near the top of a level's size band it fires
    # from aspect ~2.5; mid-band only above ~3.) Such ROIs are bumped
    # to the first coarser level whose (halving) scale fits their
    # longer side in the patch.
    # At the top level the whole map fits inside the patch (asserted
    # below), so every ROI fits by construction; clamped samples there
    # are handled exactly by the hat weights.
    assert heights[-1] <= min(PATCH_Y, PATCH_X), (
        f"top-level map {heights[-1]} exceeds the patch — use the XLA "
        "roi backend for image sizes above PATCH*2^max_level")
    cap = 44.0                                  # patch minus margins
    long_side = jnp.maximum(
        jnp.maximum(flat_rois[:, 2] - flat_rois[:, 0],
                    flat_rois[:, 3] - flat_rois[:, 1]), 0.0)
    l_needed = jnp.ceil(jnp.log2(jnp.maximum(
        long_side * float(scales[0]) / cap, 1e-6))).astype(jnp.int32)
    lvl_idx = jnp.clip(jnp.maximum(lvl_idx, l_needed), 0,
                       num_levels - 1)

    h_arr = jnp.asarray(heights, jnp.float32)[lvl_idx]
    py_arr = jnp.minimum(float(PATCH_Y), h_arr)     # per-ROI patch rows
    px_arr = jnp.minimum(float(PATCH_X), h_arr)     # per-ROI patch cols
    scale_arr = jnp.asarray(scales, jnp.float32)[lvl_idx]

    x1 = flat_rois[:, 0] * scale_arr - 0.5
    y1 = flat_rois[:, 1] * scale_arr - 0.5
    bin_w = (flat_rois[:, 2] - flat_rois[:, 0]) * scale_arr / out_size
    bin_h = (flat_rois[:, 3] - flat_rois[:, 1]) * scale_arr / out_size

    first_y = y1 + bin_h * (0.5 / s)                # sample 0
    first_x = x1 + bin_w * (0.5 / s)
    ys = jnp.clip(jnp.floor(first_y), 0.0, h_arr - py_arr)
    # x-start aligned down to the sublane tile (8): W - px_arr is a
    # multiple of 8 for every level (200/72/8/0), so the clip preserves
    # alignment; the +7 px slack is inside PATCH_X
    xs = jnp.floor(jnp.clip(jnp.floor(first_x), 0.0, h_arr - px_arr)
                   / 8.0) * 8.0

    # 1-D prefetch arrays: SMEM pads every 2-D row to 512 B, so an
    # [R, 4] layout costs R*512 B and overflows the ~2 MB SMEM budget
    # at batch>=2 (2000+ ROIs); flat 1-D stays at R*16/R*32 B
    meta = jnp.stack([img_idx, lvl_idx,
                      ys.astype(jnp.int32),
                      xs.astype(jnp.int32)],
                     axis=1).astype(jnp.int32).reshape(-1)
    fmeta = jnp.stack([
        y1 - ys, x1 - xs, bin_h, bin_w,
        (h_arr - 1.0) - ys, (h_arr - 1.0) - xs, ys, xs], axis=1
    ).astype(jnp.float32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                       # meta+fmeta -> SMEM
        grid=(r // group,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                  for _ in range(num_levels)],
        out_specs=pl.BlockSpec((group, out_size, out_size, C),
                               lambda g, m, fm: (g, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, group, PATCH_Y, PATCH_X, C), dt),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )

    out = pl.pallas_call(
        _make_kernel(out_size, s, num_levels, heights, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, out_size, out_size, C), dt),
        interpret=interpret,
    )(meta, fmeta, *fmaps)
    out = out[:r - pad] if pad else out
    if batched:
        return out.reshape(b, r_per, out_size, out_size, C)
    return out
