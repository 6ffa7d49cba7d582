"""ROI box head: multilevel ROIAlign → 2×FC-1024 → cls/box predictors.

Parity with Detectron2's StandardROIHeads/FastRCNNOutputLayers as the
reference uses them: 7×7×256 pooled features, two 1024-d FC layers (the
second's ReLU output is exactly the 1024-d feature the reference's hook
grabs from `box_predictor`'s input — ana_bbox_generator.py:201-207 hooks
`inp[0]` of box_predictor, which is fc2's output), a (K+1)-way classifier
and K×4 class-specific box deltas with weights (10, 10, 5, 5).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.detector.anchors import (clip_boxes, decode_boxes,
                                               encode_boxes)
from ekaid_tpu.ops.nms import box_iou
from ekaid_tpu.ops.roi_align import multilevel_roi_align
from ekaid_tpu.utils.dtypes import Policy, F32

ROI_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxHead(nn.Module):
    num_classes: int
    fc_dim: int = 1024
    pool_size: int = 7
    policy: Policy = F32
    roi_backend: str = "xla"  # 'xla' | 'pallas' | 'canvas'; see config
    roi_group: int = 8        # canvas: ROIs per grid step
    roi_unroll: int = 0       # canvas: unroll per fori body (0 = full)

    @nn.compact
    def __call__(self, fmaps: Sequence[jnp.ndarray], rois: jnp.ndarray,
                 scales: Sequence[float]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """fmaps p2..p5, rois [R, 4] (single image [H,W,C] maps) or
        [B, R, 4] (batched [B,H,W,C] maps — pooled in ONE kernel call,
        FCs row-wise over B·R; the inference path).
        Returns (features [..., fc_dim], scores [..., K+1],
        deltas [..., K*4]).
        """
        dt = self.policy.compute_dtype
        if rois.ndim == 3 and self.roi_backend == "canvas":
            # whole-pyramid-in-VMEM kernel (inference only, no autodiff)
            from ekaid_tpu.ops.pallas_roi import \
                multilevel_roi_align_canvas
            pooled = multilevel_roi_align_canvas(
                fmaps, rois, scales, out_size=self.pool_size,
                group=self.roi_group, unroll=self.roi_unroll)
        elif rois.ndim == 3 and self.roi_backend == "pallas":
            # patch-DMA kernel (no autodiff — inference path only)
            from ekaid_tpu.ops.pallas_roi import \
                multilevel_roi_align_pallas
            pooled = multilevel_roi_align_pallas(
                fmaps, rois, scales, out_size=self.pool_size)
        elif rois.ndim == 3:
            pooled = jax.vmap(
                lambda fm, rr: multilevel_roi_align(
                    fm, rr, scales, out_size=self.pool_size)
            )(list(fmaps), rois)
        else:
            pooled = multilevel_roi_align(fmaps, rois, scales,
                                          out_size=self.pool_size)
        x = pooled.reshape(*pooled.shape[:-3], -1).astype(dt)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=dt, name="fc1")(x))
        feat = nn.relu(nn.Dense(self.fc_dim, dtype=dt, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, dtype=dt,
                          name="cls_score")(feat)
        # deltas stay flat [R, K*4]: a [R, K, 4] layout tile-pads its
        # 4-lane minor dim 32x on TPU (observed 73x HLO-temp expansion
        # under grad+remat); consumers reshape only at the final decode
        deltas = nn.Dense(self.num_classes * 4, dtype=dt,
                          name="bbox_pred")(feat)
        return feat, scores, deltas


def decode_roi_boxes(deltas: jnp.ndarray, proposals: jnp.ndarray,
                     image_size: int) -> jnp.ndarray:
    """deltas [R, K*4] flat, proposals [R, 4] -> clipped [R, K, 4]."""
    k = deltas.shape[-1] // 4
    boxes = decode_boxes(deltas.reshape(-1, k, 4), proposals[:, None, :],
                         weights=ROI_WEIGHTS)
    return clip_boxes(boxes, image_size)


def roi_targets(proposals: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_classes: jnp.ndarray, gt_valid: jnp.ndarray,
                num_classes: int, iou_thresh: float = 0.5
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match proposals to gt: class label (background = num_classes) +
    matched gt index (Detectron2 label_and_sample semantics, matcher
    threshold 0.5/0.5)."""
    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    cls = jnp.where(best_iou >= iou_thresh, gt_classes[best], num_classes)
    return cls.astype(jnp.int32), best


def sample_proposals(proposals: jnp.ndarray, proposal_valid: jnp.ndarray,
                     gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                     gt_valid: jnp.ndarray, rng, num_classes: int,
                     batch_size: int = 512,
                     positive_fraction: float = 0.25):
    """Match + subsample proposals BEFORE pooling (Detectron2's
    label_and_sample_proposals order — pooling all post-NMS proposals in
    the train path wastes ~2x ROIAlign memory/compute).

    Returns (idx [S], weight [S], cls_t [S], matched_gt [S]) with
    S = min(batch_size, R); `weight` zeroes unsampled pad rows.
    """
    from ekaid_tpu.models.detector.rpn import sample_targets

    cls_t, matched = roi_targets(proposals, gt_boxes, gt_classes,
                                 gt_valid, num_classes)
    fg = (cls_t < num_classes) & proposal_valid
    bg = (cls_t == num_classes) & proposal_valid
    s_labels = jnp.where(fg, 1, jnp.where(bg, 0, -1))
    w = sample_targets(s_labels, rng, batch_size=batch_size,
                       positive_fraction=positive_fraction)
    s = min(batch_size, proposals.shape[0])
    pri = w + jax.random.uniform(jax.random.fold_in(rng, 7),
                                 w.shape) * 1e-3
    _, idx = jax.lax.top_k(pri, s)
    return idx, w[idx], cls_t[idx], matched[idx]


def roi_loss(scores: jnp.ndarray, deltas: jnp.ndarray,
             proposals: jnp.ndarray, cls_t: jnp.ndarray,
             matched: jnp.ndarray, weight: jnp.ndarray,
             gt_boxes: jnp.ndarray, num_classes: int,
             batch_size: int = 512) -> Dict[str, jnp.ndarray]:
    """ROI losses over the pre-sampled subset: softmax CE + L1
    (Detectron2 smooth-L1 beta=0) on the matched class's deltas,
    normalized by the sampling batch size."""
    logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, cls_t[:, None], axis=-1)[:, 0]
    cls_loss = jnp.sum(ce * weight) / batch_size

    target_deltas = encode_boxes(proposals, gt_boxes[matched],
                                 weights=ROI_WEIGHTS)
    # gather the matched class's 4 deltas from the flat [S, K*4] layout
    base = jnp.clip(cls_t, 0, num_classes - 1)[:, None] * 4
    cols = base + jnp.arange(4)[None, :]
    picked = jnp.take_along_axis(deltas, cols, axis=1)
    l1 = jnp.sum(jnp.abs(picked - target_deltas), axis=-1)
    fg = cls_t < num_classes
    box_loss = jnp.sum(l1 * weight * fg.astype(l1.dtype)) / batch_size
    return {"roi_cls": cls_loss, "roi_box": box_loss}
