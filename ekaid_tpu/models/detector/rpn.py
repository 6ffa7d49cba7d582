"""Region Proposal Network: head, proposal generation, training targets.

Detectron2-parity semantics (the backbone config the reference builds,
train_anatomy.py:562): shared 3×3 conv head with per-anchor objectness
logit and 4 deltas; at inference, per-level top-k by objectness
(pre_nms_topk), decode + clip, LEVEL-AWARE NMS at 0.7 (Detectron2's
find_top_rpn_proposals passes level ids to batched_nms, so proposals
from different pyramid levels never suppress each other) to
post_nms_topk proposals — all with static shapes and a validity mask
instead of variable-length lists.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.detector.anchors import (clip_boxes, decode_boxes,
                                               encode_boxes)
from ekaid_tpu.ops.nms import batched_nms, box_iou
from ekaid_tpu.utils.dtypes import Policy, F32


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    policy: Policy = F32
    # fused_preds: run the objectness and delta 1x1 convs as ONE
    # 15-channel conv over the shared hidden map, then slice channels.
    # Same params (kernels/biases concatenated inside the call), and
    # bit-identical outputs — each conv output channel is an
    # independent dot product, so concatenation along the output-channel
    # axis changes nothing numerically (tested). Why it can be faster:
    # the p2 hidden map is [B,256,256,256] bf16 (~268 MB at b8) read
    # once instead of twice, and the 3- and 12-channel outputs both
    # lane-pad to 128 in TPU tiled layouts (the r4f extract trace shows
    # channel-minor {3,0,2,1:T(8,128)} layouts on such tensors), so one
    # padded store replaces two. A/B: bench_backbone_groups --fused_preds.
    fused_preds: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        dt = self.policy.compute_dtype
        conv = nn.Conv(self.channels, (3, 3), padding=1, dtype=dt,
                       name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=dt,
                      name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=dt,
                         name="deltas")
        a = self.num_anchors
        if self.fused_preds:
            # instantiate the submodule params (shape-only dummy call;
            # the unused results are dead code to XLA), then run one
            # concatenated conv per level
            dummy = jnp.zeros((1, 1, 1, self.channels), dt)
            obj(dummy), deltas(dummy)
            ko = obj.variables["params"]["kernel"]
            kd = deltas.variables["params"]["kernel"]
            bo = obj.variables["params"]["bias"]
            bd = deltas.variables["params"]["bias"]
            k = jnp.concatenate([ko, kd], axis=-1).astype(dt)
            bias = jnp.concatenate([bo, bd]).astype(dt)

            def preds(h):
                p = jax.lax.conv_general_dilated(
                    h, k, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
                return p[..., :a], p[..., a:]
        else:
            def preds(h):
                return obj(h), deltas(h)
        logits, boxes = [], []
        for f in feats:
            h = nn.relu(conv(f))
            b = f.shape[0]
            lg, dl = preds(h)
            logits.append(lg.reshape(b, -1))
            boxes.append(dl.reshape(b, -1, 4))
        return logits, boxes


def generate_proposals(logits: Sequence[jnp.ndarray],
                       deltas: Sequence[jnp.ndarray],
                       anchors: Sequence[jnp.ndarray],
                       image_size: int,
                       pre_nms_topk: int = 1000,
                       post_nms_topk: int = 1000,
                       nms_thresh: float = 0.7,
                       min_size: float = 0.0,
                       topk_impl: str = "exact"
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched proposal generation.

    logits[l]: [B, N_l]; deltas[l]: [B, N_l, 4]; anchors[l]: [N_l, 4].
    Returns (boxes [B, post, 4], scores [B, post], valid [B, post]).

    topk_impl: 'exact' (Detectron2 bit-parity sort) or 'approx'
    (jax.lax.approx_max_k at recall_target 0.99 — the pre-NMS top-k is
    a heuristic preselection, so a TPU-native partial reduction is
    semantically safe; DOCUMENTED DEVIATION behind
    `detector.rpn_topk`, A/B'd in scripts/bench_extract_stages.py).
    """
    def per_image(args):
        lgs, dls = args
        lvl_boxes, lvl_scores, lvl_ids = [], [], []
        for li, (lg, dl, an) in enumerate(zip(lgs, dls, anchors)):
            k = min(pre_nms_topk, lg.shape[0])
            if topk_impl == "approx" and k < lg.shape[0]:
                sc, idx = jax.lax.approx_max_k(lg, k,
                                               recall_target=0.99)
            else:
                sc, idx = jax.lax.top_k(lg, k)
            box = decode_boxes(dl[idx], an[idx])
            box = clip_boxes(box, image_size)
            lvl_boxes.append(box)
            lvl_scores.append(sc)
            lvl_ids.append(jnp.full((k,), li, jnp.int32))
        boxes = jnp.concatenate(lvl_boxes, 0)
        scores = jnp.concatenate(lvl_scores, 0)
        ids = jnp.concatenate(lvl_ids, 0)
        if min_size > 0:
            w = boxes[:, 2] - boxes[:, 0]
            h = boxes[:, 3] - boxes[:, 1]
            scores = jnp.where((w >= min_size) & (h >= min_size), scores,
                               -1e9)
        # LEVEL-AWARE NMS (Detectron2 find_top_rpn_proposals passes
        # level ids to batched_nms): proposals from different pyramid
        # levels never suppress each other
        keep, valid = batched_nms(boxes, scores, ids, nms_thresh,
                                  post_nms_topk)
        return boxes[keep], scores[keep], valid

    return jax.vmap(lambda lg, dl: per_image((lg, dl)))(
        [l for l in logits], [d for d in deltas])


def rpn_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                pos_thresh: float = 0.7, neg_thresh: float = 0.3
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor labels (1 pos / 0 neg / -1 ignore) + matched gt index.

    Detectron2 matcher semantics: IoU >= pos_thresh -> positive;
    < neg_thresh -> negative; in between -> ignore; plus every gt's
    highest-IoU anchor is positive (allow_low_quality_matches).
    gt_boxes [G, 4] padded, gt_valid [G].
    """
    iou = box_iou(anchors, gt_boxes)                 # [N, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)                # [N]
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.full(anchors.shape[0], -1, jnp.int32)
    labels = jnp.where(best_iou < neg_thresh, 0, labels)
    labels = jnp.where(best_iou >= pos_thresh, 1, labels)
    # low-quality matches: for each valid gt, its argmax anchor is positive
    per_gt_best = jnp.argmax(iou, axis=0)            # [G]
    force = jnp.zeros(anchors.shape[0], bool).at[per_gt_best].set(
        gt_valid)
    labels = jnp.where(force, 1, labels)
    return labels, best_gt


def sample_targets(labels: jnp.ndarray, rng, batch_size: int = 256,
                   positive_fraction: float = 0.5) -> jnp.ndarray:
    """Subsample labels to `batch_size` with the given positive fraction
    (Detectron2 subsample_labels): returns weight mask [N] in {0, 1}.

    Randomization uses per-anchor uniform keys + top-k, keeping shapes
    static.
    """
    n = labels.shape[0]
    r_pos, r_neg = jax.random.split(rng)
    num_pos_target = int(batch_size * positive_fraction)

    pos = labels == 1
    neg = labels == 0
    # random priority; invalid entries sink to the bottom
    pri_pos = jnp.where(pos, jax.random.uniform(r_pos, (n,)), -1.0)
    pri_neg = jnp.where(neg, jax.random.uniform(r_neg, (n,)), -1.0)
    num_pos = jnp.minimum(jnp.sum(pos), num_pos_target)
    num_neg = jnp.minimum(jnp.sum(neg), batch_size - num_pos)

    def topk_mask(pri, count):
        k = min(batch_size, n)
        thresh_vals, _ = jax.lax.top_k(pri, k)
        # value at the count-th position (0 selected if count == 0)
        kth = thresh_vals[jnp.clip(count - 1, 0, k - 1)]
        return (pri >= kth) & (pri > 0) & (count > 0)

    return (topk_mask(pri_pos, num_pos)
            | topk_mask(pri_neg, num_neg)).astype(jnp.float32)


def rpn_loss(logits: jnp.ndarray, deltas: jnp.ndarray,
             anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
             gt_valid: jnp.ndarray, rng,
             batch_size: int = 256) -> Dict[str, jnp.ndarray]:
    """Per-image RPN loss (objectness BCE + smooth-L1 on positives),
    normalized by the sampled batch size (Detectron2 convention)."""
    labels, matched = rpn_targets(anchors, gt_boxes, gt_valid)
    w = sample_targets(labels, rng, batch_size=batch_size)
    obj_t = (labels == 1).astype(logits.dtype)
    bce = optax_sigmoid_bce(logits, obj_t)
    obj_loss = jnp.sum(bce * w) / batch_size

    target_deltas = encode_boxes(anchors, gt_boxes[matched])
    l1 = jnp.sum(jnp.abs(deltas - target_deltas), axis=-1)
    pos_w = w * obj_t
    box_loss = jnp.sum(l1 * pos_w) / batch_size
    return {"rpn_obj": obj_loss, "rpn_box": box_loss}


def optax_sigmoid_bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
