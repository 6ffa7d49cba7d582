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


def _roi_geometry(flat_rois, scales, heights, out_size: int, s: int,
                  min_level: int, num_levels: int):
    """Per-ROI level assignment (incl. the elongated-ROI fit bump, a
    DOCUMENTED DEVIATION — see multilevel_roi_align_pallas) and patch
    geometry. Returns (lvl_idx int32 [R], ys f32 [R] level-relative
    8-unaligned row starts, xs f32 [R] level-relative 8-ALIGNED col
    starts, fmeta flat f32 [R*8])."""
    levels = assign_levels(flat_rois, min_level=min_level,
                           max_level=min_level + num_levels - 1)
    lvl_idx = levels - min_level

    cap = 44.0                                  # patch minus margins
    long_side = jnp.maximum(
        jnp.maximum(flat_rois[:, 2] - flat_rois[:, 0],
                    flat_rois[:, 3] - flat_rois[:, 1]), 0.0)
    l_needed = jnp.ceil(jnp.log2(jnp.maximum(
        long_side * float(scales[0]) / cap, 1e-6))).astype(jnp.int32)
    lvl_idx = jnp.clip(jnp.maximum(lvl_idx, l_needed), 0,
                       num_levels - 1)

    h_arr = jnp.asarray(heights, jnp.float32)[lvl_idx]
    py_arr = jnp.minimum(float(PATCH_Y), h_arr)
    px_arr = jnp.minimum(float(PATCH_X), h_arr)
    scale_arr = jnp.asarray(scales, jnp.float32)[lvl_idx]

    x1 = flat_rois[:, 0] * scale_arr - 0.5
    y1 = flat_rois[:, 1] * scale_arr - 0.5
    bin_w = (flat_rois[:, 2] - flat_rois[:, 0]) * scale_arr / out_size
    bin_h = (flat_rois[:, 3] - flat_rois[:, 1]) * scale_arr / out_size

    first_y = y1 + bin_h * (0.5 / s)
    first_x = x1 + bin_w * (0.5 / s)
    ys = jnp.clip(jnp.floor(first_y), 0.0, h_arr - py_arr)
    xs = jnp.floor(jnp.clip(jnp.floor(first_x), 0.0, h_arr - px_arr)
                   / 8.0) * 8.0

    fmeta = jnp.stack([
        y1 - ys, x1 - xs, bin_h, bin_w,
        (h_arr - 1.0) - ys, (h_arr - 1.0) - xs, ys, xs], axis=1
    ).astype(jnp.float32).reshape(-1)
    return lvl_idx, ys, xs, fmeta


def _make_canvas_kernel(out_size: int, sampling_ratio: int,
                        num_levels: int, heights: tuple, x_off: tuple,
                        group: int, n_chunks: int,
                        pooling: str = "separable",
                        unroll: int = 0):
    """Whole-pyramid-in-VMEM variant: levels are DMA'd ONCE per image
    into a canvas scratch (side by side along x), and every ROI slices
    its 48×56 patch from VMEM — no per-ROI HBM traffic at all. The
    patch-DMA kernel re-reads ~1.4 GB/image of overlapping patches from
    HBM (1000 ROIs × 1.4 MB); the canvas reads each level byte exactly
    once (~21 MB/image at C=256 bf16)."""
    s = sampling_ratio
    os_ = out_size * s

    def kernel(meta_s, fmeta_s, *rest):
        lvl_maps = rest[:num_levels]
        out_ref, canvas, sems = rest[num_levels:]
        b = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when((b == 0) & (g == 0))
        def _():
            # one-time zero: the padding regions (rows below a level's
            # height, the x tail) are never DMA'd, and 0-weight ×
            # uninit(NaN) would poison the pooling matmuls. Level
            # regions are overwritten by the DMAs every image.
            canvas[...] = jnp.zeros(canvas.shape, canvas.dtype)

        def level_copy(li):
            h = heights[li]
            return pltpu.make_async_copy(
                lvl_maps[li].at[b],
                canvas.at[pl.ds(0, h), pl.ds(x_off[li], h), :],
                sems.at[li])

        @pl.when(g == 0)
        def _():
            for li in range(num_levels):
                level_copy(li).start()
            for li in range(num_levels):
                level_copy(li).wait()

        # hat/bin matrices from iota (see the patch-DMA kernel)
        bin_i = jax.lax.broadcasted_iota(jnp.int32, (out_size, os_), 0)
        samp_i = jax.lax.broadcasted_iota(jnp.int32, (out_size, os_), 1)
        pavg = jnp.where(samp_i // s == bin_i, 1.0 / s, 0.0)
        iota_os_i = jax.lax.broadcasted_iota(jnp.int32, (os_, 1), 0)
        iota_py = jax.lax.broadcasted_iota(
            jnp.int32, (os_, PATCH_Y), 1).astype(jnp.float32)
        iota_px = jax.lax.broadcasted_iota(
            jnp.int32, (os_, PATCH_X), 1).astype(jnp.float32)
        grid = ((iota_os_i // s).astype(jnp.float32)
                + ((iota_os_i % s).astype(jnp.float32) + 0.5) / s)

        def one_roi(r, j):
            """Pool ROI r (flat index) into out_ref[j]. j may be a
            traced scalar (fori_loop) or a Python int (unrolled)."""
            y1r = fmeta_s[8 * r + 0]
            x1r = fmeta_s[8 * r + 1]
            bh = fmeta_s[8 * r + 2]
            bw = fmeta_s[8 * r + 3]
            yhi = fmeta_s[8 * r + 4]
            xhi = fmeta_s[8 * r + 5]
            ysf = fmeta_s[8 * r + 6]
            xsf = fmeta_s[8 * r + 7]

            def hat(origin, binsz, hi, start_f, iota_p):
                raw = origin + binsz * grid
                absc = raw + start_f
                full = hi + start_f + 1.0
                ins = ((absc >= -1.0)
                       & (absc <= full)).astype(jnp.float32)
                cl = jnp.clip(raw, 0.0, hi)
                w = jnp.maximum(0.0, 1.0 - jnp.abs(cl - iota_p)) * ins
                return jnp.dot(pavg, w)

            a_y = hat(y1r, bh, yhi, ysf, iota_py)
            b_x = hat(x1r, bw, xhi, xsf, iota_px)

            # uniform VMEM slice; weight columns beyond the ROI's level
            # are exactly 0, so spill into a neighbouring level's
            # region (or the zeroed padding) contributes nothing.
            # The pooling matmul runs at the FEATURE dtype with f32
            # accumulation (bf16×bf16→f32 on the MXU): casting the
            # whole 48×56×C patch to f32 per ROI costs more VPU time
            # than the pooling itself (DOCUMENTED: the patch-DMA
            # variant keeps full f32 operands; this one matches the
            # XLA bf16 path's precision instead)
            patch = canvas[pl.ds(meta_s[2 * r + 0], PATCH_Y),
                           pl.ds(pl.multiple_of(meta_s[2 * r + 1], 8),
                                 PATCH_X), :]
            c = patch.shape[-1]
            if pooling == "kron":
                # one fused matmul: W[oy·os+ox, y·PX+x] =
                # a_y[oy,y]·b_x[ox,x] — 7x the separable FLOPs but a
                # single K=2688 MXU pass per ROI and no output
                # transpose (y-major W matches patch.reshape order)
                w = (a_y[:, None, :, None]
                     * b_x[None, :, None, :]).reshape(
                         out_size * out_size, PATCH_Y * PATCH_X)
                o = jnp.dot(w.astype(patch.dtype),
                            patch.reshape(PATCH_Y * PATCH_X, c),
                            preferred_element_type=jnp.float32)
                out_ref[pl.ds(j, 1)] = o.reshape(
                    1, out_size, out_size, c).astype(out_ref.dtype)
            else:
                t = jnp.dot(a_y.astype(patch.dtype),
                            patch.reshape(PATCH_Y, PATCH_X * c),
                            preferred_element_type=jnp.float32)
                t = t.reshape(out_size, PATCH_X, c)
                o = jax.lax.dot_general(b_x, t,
                                        (((1,), (1,)), ((), ())))
                out_ref[pl.ds(j, 1)] = o.transpose(1, 0, 2)[None].astype(
                    out_ref.dtype)

        base = (b * n_chunks + g) * group
        if not unroll or unroll >= group:
            # fully unrolled (round-3 behavior): per-grid-step fixed
            # cost amortizes over `group` ROIs, but kernel code size
            # grows with group — group>8 hit the remote-compile
            # pathology (see multilevel_roi_align_canvas docstring)
            for j in range(group):
                one_roi(base + j, j)
        else:
            # two-level: fori_loop over group//unroll blocks, `unroll`
            # ROIs Python-unrolled per iteration — grid steps (and
            # their fixed cost) shrink by group/8 while code size stays
            # at the proven-compilable unroll factor
            def body(blk, _):
                for u in range(unroll):
                    j = blk * unroll + u
                    one_roi(base + j, j)
                return _

            jax.lax.fori_loop(0, group // unroll, body, 0)

    return kernel


def multilevel_roi_align_canvas(fmaps: Sequence[jnp.ndarray],
                                rois: jnp.ndarray,
                                scales: Sequence[float],
                                out_size: int = 7,
                                sampling_ratio: int = 2,
                                min_level: int = 2,
                                interpret: bool = False,
                                pooling: str = "separable",
                                group: int = 8,
                                unroll: int = 0) -> jnp.ndarray:
    """Canvas variant of multilevel_roi_align_pallas (same contract and
    ROI geometry/level-bump semantics). Requires the whole pyramid of
    one image to fit VMEM (~66 MB at 1024²/C=256 bf16) — the extraction
    geometry; use the patch-DMA or XLA backends otherwise.

    `group` = ROIs pooled per grid step; amortizes per-grid-step fixed
    cost (block bookkeeping, out DMA issue) against kernel code size.
    `unroll` (0 = fully unrolled, round-3 behavior) caps the PYTHON
    unroll: when 0 < unroll < group the kernel runs a fori_loop of
    group//unroll iterations with `unroll` ROIs unrolled per body, so
    group can grow past 8 at CONSTANT code size. Measured on-chip (r3):
    fully-unrolled group=16 hit the remote-compile long-program
    pathology (>15 min vs 107 s at group=8) — that is a code-size
    limit, which `unroll` decouples from the grid-step count.

    `pooling='kron'` is INTERPRET-ONLY: real Mosaic rejects its
    weight-matrix build (`tpu.reshape vector<7x7x48x56> ->
    vector<49x2688>`: lane-merging reshapes are an unsupported shape
    cast; interpret mode doesn't model layout legality). A legal
    restructuring (expanding a_y/b_x via constant 0/1 matmuls) costs
    ~3x the pooling FLOPs and defeats the single-pass premise, so the
    variant is kept as interpret-verified reference code only."""
    if pooling == "kron" and not interpret:
        raise NotImplementedError(
            "pooling='kron' is interpret-only: Mosaic rejects its "
            "lane-merging weight reshape (unsupported shape cast); "
            "use pooling='separable' on hardware")
    if 0 < unroll < group and group % unroll != 0:
        # the two-level kernel runs group//unroll fori blocks of
        # `unroll` ROIs — a remainder would leave group%unroll output
        # rows per grid step unwritten (silent garbage features)
        raise ValueError(
            f"group ({group}) must be divisible by unroll ({unroll}) "
            f"when 0 < unroll < group — the fori_loop kernel pools "
            f"exactly group//unroll * unroll ROIs per grid step")
    batched = rois.ndim == 3
    if not batched:
        fmaps = [f[None] for f in fmaps]
        rois = rois[None]
    b, r_per = rois.shape[0], rois.shape[1]

    num_levels = len(fmaps)
    heights = tuple(int(f.shape[1]) for f in fmaps)
    for f in fmaps:
        assert f.shape[1] == f.shape[2], "level maps must be square"
    assert all(heights[i] > heights[i + 1]
               for i in range(num_levels - 1)), "levels must shrink"
    for h in heights:
        assert h % 8 == 0, "level sizes must be 8-aligned (canvas)"
        assert (h - min(PATCH_X, h)) % 8 == 0
    assert heights[-1] <= min(PATCH_Y, PATCH_X), (
        "top-level map exceeds the patch — use the XLA roi backend")

    C = fmaps[0].shape[-1]
    dt = fmaps[0].dtype

    # ROI-count guard (SMEM prefetch budget): chunk the ROI dim
    max_rois = 16384
    if b * r_per > max_rois and r_per > max_rois // b:
        rc = max(group, (max_rois // b) // group * group)
        pad_r = (-r_per) % rc
        rp = jnp.concatenate(
            [rois, jnp.zeros((b, pad_r, 4), rois.dtype)],
            axis=1) if pad_r else rois
        blocks = jnp.swapaxes(rp.reshape(b, -1, rc, 4), 0, 1)

        def one_blk(blk):
            return multilevel_roi_align_canvas(
                list(fmaps), blk, scales, out_size=out_size,
                sampling_ratio=sampling_ratio, min_level=min_level,
                interpret=interpret, pooling=pooling, group=group,
                unroll=unroll)

        out = jax.lax.map(one_blk, blocks)
        out = jnp.swapaxes(out, 0, 1).reshape(
            b, -1, out_size, out_size, C)[:, :r_per]
        return out if batched else out[0]

    pad_r = (-r_per) % group
    if pad_r:
        rois = jnp.concatenate(
            [rois, jnp.zeros((b, pad_r, 4), rois.dtype)], axis=1)
    rp = r_per + pad_r
    n_chunks = rp // group
    flat_rois = rois.reshape(-1, 4)

    lvl_idx, ys, xs, fmeta = _roi_geometry(
        flat_rois, scales, heights, out_size, sampling_ratio,
        min_level, num_levels)

    x_off = [0]
    for h in heights[:-1]:
        x_off.append(x_off[-1] + h)
    x_off = tuple(x_off)
    canvas_h = max(heights[0], PATCH_Y)
    canvas_w = x_off[-1] + max(heights[-1], PATCH_X)

    xs_canvas = xs + jnp.asarray(x_off, jnp.float32)[lvl_idx]
    meta = jnp.stack([ys.astype(jnp.int32),
                      xs_canvas.astype(jnp.int32)],
                     axis=1).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)
                  for _ in range(num_levels)],
        out_specs=pl.BlockSpec(
            (group, out_size, out_size, C),
            lambda bb, g, m, fm: (bb * n_chunks + g, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((canvas_h, canvas_w, C), dt),
            pltpu.SemaphoreType.DMA((num_levels,)),
        ],
    )

    # the canvas scratch alone can be ~66 MB (256×504×256 bf16) —
    # far past Mosaic's default 16 MB scoped-vmem limit; raise it to
    # most of the chip's 128 MB VMEM for this kernel only
    canvas_bytes = canvas_h * canvas_w * C * dt.itemsize
    assert canvas_bytes <= 100 * 2**20, (
        f"pyramid canvas {canvas_bytes/2**20:.0f} MB exceeds VMEM — "
        "use the patch-DMA or XLA roi backend for this geometry")
    out = pl.pallas_call(
        _make_canvas_kernel(out_size, sampling_ratio, num_levels,
                            heights, x_off, group, n_chunks,
                            pooling=pooling, unroll=unroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * rp, out_size, out_size, C),
                                       dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20),
        interpret=interpret,
    )(meta, fmeta, *fmaps)
    out = out.reshape(b, rp, out_size, out_size, C)[:, :r_per]
    return out if batched else out[0]


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

    # Level assignment incl. the elongated-ROI fit bump (DOCUMENTED
    # DEVIATION, docs/PARITY.md): assign_levels bounds sqrt(w*h) only,
    # so a box whose LONG SIDE at its assigned level exceeds the 44 px
    # cap is bumped to the first coarser level that fits (else the
    # overflowed columns would silently pool zeros). At the top level
    # the whole map fits inside the patch (asserted), so every ROI
    # fits by construction.
    assert heights[-1] <= min(PATCH_Y, PATCH_X), (
        f"top-level map {heights[-1]} exceeds the patch — use the XLA "
        "roi backend for image sizes above PATCH*2^max_level")
    lvl_idx, ys, xs, fmeta = _roi_geometry(
        flat_rois, scales, heights, out_size, s, min_level, num_levels)

    # 1-D prefetch arrays: SMEM pads every 2-D row to 512 B, so an
    # [R, 4] layout costs R*512 B and overflows the ~2 MB SMEM budget
    # at batch>=2 (2000+ ROIs); flat 1-D stays at R*16/R*32 B
    meta = jnp.stack([img_idx, lvl_idx,
                      ys.astype(jnp.int32),
                      xs.astype(jnp.int32)],
                     axis=1).astype(jnp.int32).reshape(-1)

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
