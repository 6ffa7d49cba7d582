"""Pallas TPU kernel: greedy NMS with VMEM-resident state.

The XLA formulation in ekaid_tpu.ops.nms runs `max_out` sequential
`fori_loop` iterations, each an HLO loop step over [R] arrays. This
kernel keeps boxes/scores/live-mask in VMEM for the whole selection loop
— one kernel launch, no per-iteration HLO loop overhead — and writes the
(indices, valid) contract directly. Semantics are identical to
ops.nms.nms (descending score, IoU > thresh suppression, geometric IoU);
the unit tests assert bit-equality of selections.

Batched via the pallas grid: one program per image, rows blocked per
image. Scores/boxes padding convention: callers pass score -1e9 (NEG)
rows for padding, same as the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _nms_kernel(boxes_ref, scores_ref, thresh_ref, idx_ref, valid_ref,
                live_ref):
    r = scores_ref.shape[0]
    thresh = thresh_ref[0]
    live_ref[:] = (scores_ref[:] > NEG / 2).astype(jnp.float32)

    x1 = boxes_ref[:, 0]
    y1 = boxes_ref[:, 1]
    x2 = boxes_ref[:, 2]
    y2 = boxes_ref[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def body(i, _):
        masked = jnp.where(live_ref[:] > 0, scores_ref[:], NEG)
        best = jnp.argmax(masked).astype(jnp.int32)
        ok = masked[best] > NEG
        bx1 = x1[best]
        by1 = y1[best]
        bx2 = x2[best]
        by2 = y2[best]
        barea = area[best]
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppress = (iou > thresh) | (
            jax.lax.broadcasted_iota(jnp.int32, (r,), 0) == best)
        live_ref[:] = jnp.where(suppress, 0.0, live_ref[:])
        idx_ref[i] = jnp.where(ok, best, 0)
        valid_ref[i] = ok.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)


@partial(jax.jit, static_argnames=("max_out",))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
               max_out: int):
    """Single-image greedy NMS. boxes [R,4] f32, scores [R] f32 ->
    (indices [max_out] int32, valid [max_out] bool). Padding rows must
    carry score <= -5e8."""
    r = boxes.shape[0]
    thresh = jnp.full((1,), iou_thresh, jnp.float32)
    idx, valid = pl.pallas_call(
        _nms_kernel,
        out_shape=(jax.ShapeDtypeStruct((max_out,), jnp.int32),
                   jax.ShapeDtypeStruct((max_out,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((r,), jnp.float32)],
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32), thresh)
    return idx, valid.astype(bool)
