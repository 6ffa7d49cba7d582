"""Padded, jit-able non-maximum suppression that returns kept indices.

The reference's entire forward-hook machinery exists because Detectron2's
CUDA `batched_nms` discards the mapping from kept detections back to
proposal rows — it re-implements `fast_rcnn_inference_single_image` just
to return `keep` ("feature extraction/get_bbox_id.py":16-39,124-177).
Here the contract is first-class: every NMS returns `(indices, valid)`
with static shapes, so downstream code can gather the 1024-d proposal
features directly inside the same XLA program.

Algorithm: iterative argmax selection — select the highest remaining
score, emit it, suppress everything with IoU > threshold, repeat for a
static `max_out` iterations via `lax.fori_loop` (the TPU-friendly NMS
shape: no data-dependent shapes, no host sync). Class-aware variants use
the coordinate-offset trick so boxes of different classes never suppress
each other (equivalent to torchvision batched_nms).

IoU here is the geometric convention (no +1) used by detection NMS, as
in torchvision/Detectron2 — distinct from the graph ops' +1 convention
(ana_bbox_generator.py:213-240), which `ekaid_tpu.ops.graph` keeps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, geometric convention. a: [N,4], b: [M,4] -> [N,M]."""
    ax1, ay1, ax2, ay2 = jnp.split(a, 4, axis=-1)
    bx1, by1, bx2, by2 = [v[:, 0] for v in jnp.split(b, 4, axis=-1)]
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("max_out",))
def nms_argmax(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
               max_out: int, score_thresh: float = float("-inf")
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS via iterative argmax: `max_out` sequential steps.
    Reference implementation for tests — on this TPU stack XLA compile
    time grows pathologically with the loop trip count (>10 min at
    max_out=1000), so `nms` below uses the blocked formulation."""
    r = boxes.shape[0]
    live = scores > score_thresh

    def body(i, carry):
        live, out_idx, out_valid = carry
        masked = jnp.where(live, scores, NEG)
        best = jnp.argmax(masked)
        ok = masked[best] > NEG
        ious = box_iou(boxes[best][None], boxes)[0]
        suppress = ious > iou_thresh
        live = live & ~suppress & (jnp.arange(r) != best)
        out_idx = out_idx.at[i].set(jnp.where(ok, best, 0).astype(jnp.int32))
        out_valid = out_valid.at[i].set(ok)
        return live, out_idx, out_valid

    out_idx = jnp.zeros(max_out, jnp.int32)
    out_valid = jnp.zeros(max_out, bool)
    _, out_idx, out_valid = jax.lax.fori_loop(
        0, max_out, body, (live, out_idx, out_valid))
    return out_idx, out_valid


def _survivor_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                   iou_thresh: float, block: int = 256) -> jnp.ndarray:
    """Exact greedy-NMS survivor set via the blocked TPU algorithm.

    Key fact: the greedy survivor set does not depend on any output cap,
    so NMS = survivors ∩ top-k by score. Boxes are processed in
    descending-score order in blocks of `block`: within a block, the
    "suppressed by a live predecessor" map is iterated to its fixed
    point (a bounded while loop — converges in at most `block` steps,
    typically a handful); live block members then suppress everything
    later in one [B, R] matrix op. Sequential depth is R/block (≈20 for
    R=5000) instead of max_out (1000), which keeps both compile time and
    run time small.

    Returns a boolean mask over the ORIGINAL box order.
    """
    r = boxes.shape[0]
    b = min(block, r)
    nblk = -(-r // b)
    pad = nblk * b - r

    order = jnp.argsort(-scores, stable=True)
    sboxes = boxes[order]
    sscores = scores[order]
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        sscores = jnp.pad(sscores, (0, pad), constant_values=NEG)

    live = sscores > NEG / 2          # padding + pre-masked rows dead

    def outer(carry, blk_idx):
        live = carry
        start = blk_idx * b
        blk_boxes = jax.lax.dynamic_slice(sboxes, (start, 0), (b, 4))
        blk_live = jax.lax.dynamic_slice(live, (start,), (b,))

        iou_bb = box_iou(blk_boxes, blk_boxes)
        upper = (jnp.arange(b)[:, None] < jnp.arange(b)[None, :])
        sup_map = upper & (iou_bb > iou_thresh)

        def cond(state):
            s, changed = state
            return changed

        def fix(state):
            s, _ = state
            s_new = blk_live & ~jnp.any(sup_map & s[:, None], axis=0)
            return s_new, jnp.any(s_new != s)

        blk_alive, _ = jax.lax.while_loop(cond, fix,
                                          (blk_live, jnp.bool_(True)))

        # live block members suppress every lower-scored box
        iou_br = box_iou(blk_boxes, sboxes)          # [B, R']
        hit = jnp.any((iou_br > iou_thresh) & blk_alive[:, None], axis=0)
        later = jnp.arange(sboxes.shape[0]) >= start + b
        live = live & ~(hit & later)
        live = jax.lax.dynamic_update_slice(live, blk_alive, (start,))
        return live, None

    live, _ = jax.lax.scan(outer, live, jnp.arange(nblk))
    live = live[:r]
    mask = jnp.zeros(r, bool).at[order].set(live)
    return mask


@partial(jax.jit, static_argnames=("max_out", "block"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
        max_out: int, score_thresh: float = float("-inf"),
        block: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS. boxes [R,4], scores [R] -> (indices [max_out] int32,
    valid [max_out] bool), indices in descending-score order — identical
    selections to torchvision/`nms_argmax` (blocked algorithm; see
    `_survivor_mask`)."""
    live = scores > score_thresh
    masked = jnp.where(live, scores, NEG)
    surv = _survivor_mask(boxes, masked, iou_thresh, block=block)
    sel_scores = jnp.where(surv & live, masked, NEG)
    k = min(max_out, boxes.shape[0])
    top, idx = jax.lax.top_k(sel_scores, k)
    valid = top > NEG
    if k < max_out:
        idx = jnp.pad(idx, (0, max_out - k))
        valid = jnp.pad(valid, (0, max_out - k))
    return idx.astype(jnp.int32), valid


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                classes: jnp.ndarray, iou_thresh: float, max_out: int,
                score_thresh: float = float("-inf")
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via per-class coordinate offsets
    (torchvision.ops.batched_nms equivalence)."""
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offset = classes.astype(boxes.dtype)[:, None] * span
    return nms(boxes + offset, scores, iou_thresh, max_out, score_thresh)


def fast_rcnn_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                  iou_thresh: float = 0.5, score_thresh: float = 0.0,
                  max_out: int = 100):
    """Class-wise inference NMS (fast_rcnn_inference_single_image parity,
    get_bbox_id.py:124-177) with static shapes.

    boxes:  [R, K, 4] class-specific boxes (already decoded + clipped)
    scores: [R, K+1] softmax probs; the background column (last) is
            dropped (:148)

    Returns dict with, per kept slot (sorted by score):
      proposal_idx [max_out] — row in [0, R) (the reference's `keep //
      K`, ana_bbox_generator.py:583 `ids / len(category)`),
      class_idx [max_out], boxes [max_out, 4], scores [max_out],
      valid [max_out].
    """
    r, k = scores.shape[0], scores.shape[1] - 1
    cls_scores = scores[:, :k]                      # [R, K]
    # score_thresh filter (:157): strictly greater, as the reference
    masked = jnp.where(cls_scores > score_thresh, cls_scores, NEG)
    # class-wise NMS has zero cross-class suppression by definition, so
    # run the blocked survivor mask per class (vmapped: K parallel
    # lanes of R rows = R/block sequential steps) instead of one
    # class-offset pass over R*K rows (R*K/block steps — measured 102
    # blocks and ~5 ms/image of the v5e extract tail at R=1000, K=26)
    surv = jax.vmap(
        lambda b, s: _survivor_mask(b, s, iou_thresh))(
            boxes.transpose(1, 0, 2), masked.T)     # [K, R]
    sel = jnp.where(surv.T & (masked > NEG / 2), masked, NEG)  # [R, K]
    flat_scores = cls_scores.reshape(-1)            # row-major (prop, cls)
    flat_boxes = boxes.reshape(-1, 4)
    # top-k in the same flat (prop, cls) order as the class-offset
    # formulation -> identical selections AND identical tie order
    m = min(max_out, r * k)
    top, idx = jax.lax.top_k(sel.reshape(-1), m)
    valid = top > NEG
    if m < max_out:
        idx = jnp.pad(idx, (0, max_out - m))
        valid = jnp.pad(valid, (0, max_out - m))
    idx = idx.astype(jnp.int32)
    return {
        "proposal_idx": (idx // k).astype(jnp.int32),
        "class_idx": (idx % k).astype(jnp.int32),
        "boxes": flat_boxes[idx],
        "scores": flat_scores[idx],
        "valid": valid,
    }


def select_top1_per_class(boxes: jnp.ndarray, scores: jnp.ndarray,
                          iou_thresh: float = 0.5,
                          score_thresh: float = 0.0,
                          pre: int = 100
                          ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                     jnp.ndarray]:
    """Fused anatomy selection: per-class best NMS survivor + the
    reference's pre_extract_num rank cap, WITHOUT materializing the
    top-`pre` detection list.

    Exactly equivalent (tie order included) to
    `fast_rcnn_nms(...)` + `top1_per_class(...)`: the first kept slot
    of class c in the score-sorted top-`pre` IS the per-class argmax of
    the surviving scores, present iff its global rank (flat row-major
    (proposal, class) tie order — jax.lax.top_k's order) is < `pre`.
    TPU-first: replaces a [R*K] top_k sort + [pre]-wide box/score/index
    gathers (the ~2.5-5.6 ms `convert_reduce_fusion`/`fusion` tail in
    the r4 extract profile) with two [R, K] reductions and one [K, R*K]
    comparison — no sort, no gather. Equivalence pinned by
    tests/test_detector_ops.py::test_select_top1_direct_equivalence.
    Reference semantics: ana_bbox_generator.py:557-600.

    boxes:  [R, K, 4] decoded+clipped class-specific boxes
    scores: [R, K+1] softmax probs (background column dropped)
    Returns (rows [K] int32 — proposal row per class, found [K] bool,
    sel_scores [K] f32).
    """
    r, k = scores.shape[0], scores.shape[1] - 1
    cls_scores = scores[:, :k]
    masked = jnp.where(cls_scores > score_thresh, cls_scores, NEG)
    surv = jax.vmap(
        lambda b, s: _survivor_mask(b, s, iou_thresh))(
            boxes.transpose(1, 0, 2), masked.T)         # [K, R]
    sel = jnp.where(surv.T & (masked > NEG / 2), masked, NEG)  # [R, K]
    best_row = jnp.argmax(sel, axis=0).astype(jnp.int32)       # [K]
    best_val = jnp.max(sel, axis=0)                            # [K]
    found = best_val > NEG / 2
    # rank in jax.lax.top_k's flat order: strictly-greater entries plus
    # equal entries at a smaller flat (row-major) index
    flat = sel.reshape(-1)
    flat_idx = jnp.arange(r * k)
    best_flat = best_row * k + jnp.arange(k)
    gt = flat[None, :] > best_val[:, None]                    # [K, R*K]
    eq = ((flat[None, :] == best_val[:, None])
          & (flat_idx[None, :] < best_flat[:, None]))
    rank = jnp.sum(gt | eq, axis=1)
    found = found & (rank < pre)
    return best_row, found, jnp.where(found, best_val, 0.0)


def top1_per_class(class_idx: jnp.ndarray, valid: jnp.ndarray,
                   num_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each class c, the first kept slot with that class
    (detections arrive score-sorted from NMS), else invalid — the
    vectorized form of the per-class ordering loop
    (ana_bbox_generator.py:578-600).

    Returns (slot [num_classes] int32, found [num_classes] bool).
    """
    onehot = (class_idx[None, :] == jnp.arange(num_classes)[:, None])
    onehot = onehot & valid[None, :]
    slot = jnp.argmax(onehot, axis=1).astype(jnp.int32)
    found = jnp.any(onehot, axis=1)
    return slot, found
