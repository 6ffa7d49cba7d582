"""Pallas TPU kernel: greedy NMS with VMEM-resident state.

The XLA formulation in ekaid_tpu.ops.nms runs `max_out` sequential
`fori_loop` iterations, each an HLO loop step over [R] arrays. This
kernel keeps boxes/scores/live-mask in VMEM for the whole selection loop
— one kernel launch, no per-iteration HLO loop overhead — and writes the
(indices, valid) contract directly. Semantics are identical to
ops.nms.nms (descending score, IoU > thresh suppression, geometric IoU);
the unit tests assert bit-equality of selections.

TPU lowering requires the minor dimension of every blocked ref to be a
multiple of 128 (the vmap-batched specs can't take the "equal to the
array" escape hatch), so R is padded up to a 128 multiple with NEG
scores, max_out up to a 128 multiple (sliced off on return), and the
1-D payloads travel as [1, N] so the last-two-dims tiling rule is
satisfiable. Batched use is `jax.vmap(nms_pallas, ...)`.

Padding convention: callers pass score <= -5e8 rows for padding, same
as the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _nms_kernel(boxes_ref, scores_ref, thresh_ref, idx_ref, valid_ref,
                live_ref):
    r = scores_ref.shape[1]
    m = idx_ref.shape[1]
    thresh = thresh_ref[0]
    live_ref[0, :] = (scores_ref[0, :] > NEG / 2).astype(jnp.float32)
    idx_ref[0, :] = jnp.zeros((m,), jnp.int32)
    valid_ref[0, :] = jnp.zeros((m,), jnp.int32)

    x1 = boxes_ref[:, 0]
    y1 = boxes_ref[:, 1]
    x2 = boxes_ref[:, 2]
    y2 = boxes_ref[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r,), 0)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)

    # the TPU lowering has no dynamic_slice: scalar picks (`x[best]`)
    # become masked reductions, the per-step result store becomes a
    # one-hot select over the whole output row
    def body(i, _):
        masked = jnp.where(live_ref[0, :] > 0, scores_ref[0, :], NEG)
        best_val = jnp.max(masked)
        sel = (masked == best_val) & (
            iota_r == jnp.min(jnp.where(masked == best_val, iota_r, r)))
        best = jnp.sum(jnp.where(sel, iota_r, 0)).astype(jnp.int32)
        ok = best_val > NEG
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0))
        by1 = jnp.sum(jnp.where(sel, y1, 0.0))
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0))
        by2 = jnp.sum(jnp.where(sel, y2, 0.0))
        barea = jnp.sum(jnp.where(sel, area, 0.0))
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppress = (iou > thresh) | sel
        live_ref[0, :] = jnp.where(suppress, 0.0, live_ref[0, :])
        write = iota_m == i
        idx_ref[0, :] = jnp.where(write, jnp.where(ok, best, 0),
                                  idx_ref[0, :])
        valid_ref[0, :] = jnp.where(write, ok.astype(jnp.int32),
                                    valid_ref[0, :])
        return 0

    jax.lax.fori_loop(0, m, body, 0)


@partial(jax.jit, static_argnames=("max_out",))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
               max_out: int):
    """Single-image greedy NMS. boxes [R,4] f32, scores [R] f32 ->
    (indices [max_out] int32, valid [max_out] bool). Padding rows must
    carry score <= -5e8."""
    r = boxes.shape[0]
    r_pad = _round_up(r, 128)
    m_pad = _round_up(max_out, 128)
    boxes = jnp.pad(boxes.astype(jnp.float32), ((0, r_pad - r), (0, 0)))
    scores = jnp.pad(scores.astype(jnp.float32), (0, r_pad - r),
                     constant_values=NEG)[None, :]
    thresh = jnp.full((1,), iou_thresh, jnp.float32)
    idx, valid = pl.pallas_call(
        _nms_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, m_pad), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, r_pad), jnp.float32)],
    )(boxes, scores, thresh)
    return idx[0, :max_out], valid[0, :max_out].astype(bool)
