"""Faster R-CNN R50-FPN: one jittable program for detection + extraction.

The reference runs extraction at batch 1 through forward hooks
(ana_bbox_generator.py:475-487,557-600; "only 1 is allowed",
bbox_generator_by_location.py:636) because Detectron2's NMS discards
proposal indices. Here `extract` is a single batched XLA program:
backbone → RPN proposals → ROIAlign → box head → class-wise NMS with
kept-index tracking → per-class top-1 selection — returning exactly
`num_classes` ordered nodes per image with their 1024-d fc2 features
(zero-filled where a class is missing, ana_bbox_generator.py:592-597).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.detector.anchors import pyramid_anchors
from ekaid_tpu.models.detector.backbone import ResNetFPN
from ekaid_tpu.models.detector.heads import (BoxHead, decode_roi_boxes,
                                             roi_loss, sample_proposals)
from ekaid_tpu.models.detector.rpn import (RPNHead, generate_proposals,
                                           rpn_loss)
from ekaid_tpu.ops.nms import (fast_rcnn_nms, select_top1_per_class,
                               top1_per_class)
from ekaid_tpu.utils.dtypes import Policy, F32

FPN_SCALES = (0.25, 0.125, 0.0625, 0.03125)      # p2..p5


class FasterRCNN(nn.Module):
    cfg: Any                      # DetectorConfig
    num_classes: int = 26         # 26 anatomy / 22 disease detectors
    norm: str = "gn"
    stride_in_1x1: bool = False   # True for converted Detectron2 weights
    policy: Policy = F32

    def setup(self):
        self.backbone = ResNetFPN(self.cfg.fpn_channels, norm=self.norm,
                                  stride_in_1x1=self.stride_in_1x1,
                                  s2d_stem=getattr(self.cfg, "s2d_stem",
                                                   False),
                                  policy=self.policy, name="backbone")
        self.rpn = RPNHead(policy=self.policy,
                           fused_preds=getattr(self.cfg,
                                               "rpn_fused_preds", False),
                           name="rpn")
        # 'auto' is resolved ONCE at the config/runner layer
        # (utils/platform.py::resolve_roi_backend, called by
        # extract/runner.py::build_detector_fns) — a device query here
        # would fire at every model build (wedged-chip hang risk, see
        # memory: axon-tpu-quirks) and bake the trace-time platform into
        # the module, breaking cross-platform AOT lowering. A module
        # built directly with 'auto' (tests, converters) gets the
        # platform-agnostic XLA gather.
        backend = getattr(self.cfg, "roi_backend", "auto")
        if backend == "auto":
            backend = "xla"
        self.box_head = BoxHead(self.num_classes,
                                fc_dim=self.cfg.roi_feat_dim,
                                pool_size=self.cfg.roi_pool_size,
                                policy=self.policy,
                                roi_backend=backend,
                                roi_group=getattr(self.cfg, "roi_group", 8),
                                roi_unroll=getattr(self.cfg, "roi_unroll",
                                                   0),
                                name="box_head")

    def _features(self, images):
        feats = self.backbone(images)
        return [feats[f"p{l}"] for l in (2, 3, 4, 5, 6)]

    def _proposals(self, pyramid, train: bool = False):
        logits, deltas = self.rpn(pyramid)
        anchors = [jnp.asarray(a) for a in pyramid_anchors(
            self.cfg.image_size)]
        boxes, scores, valid = generate_proposals(
            logits, deltas, anchors, self.cfg.image_size,
            pre_nms_topk=2000 if train else self.cfg.pre_nms_topk,
            post_nms_topk=self.cfg.post_nms_topk,
            nms_thresh=0.7,
            # approx top-k only ever applies at inference: training
            # keeps the exact sort (sampling parity)
            topk_impl=("exact" if train else
                       getattr(self.cfg, "rpn_topk", "exact")))
        return (logits, deltas, anchors), (boxes, scores, valid)

    def __call__(self, images, train: bool = False):
        """Plain detection forward: returns proposals and ROI outputs."""
        pyramid = self._features(images)
        _, (boxes, scores, valid) = self._proposals(pyramid, train=train)
        # one batched pooling call (B·R ROIs) + row-wise FCs — no
        # per-image vmap: bigger matmuls and the pallas patch-DMA path
        feats, cls_scores, box_deltas = self.box_head(
            pyramid[:4], boxes, FPN_SCALES)
        return {"proposals": boxes, "proposal_scores": scores,
                "proposal_valid": valid, "roi_features": feats,
                "cls_scores": cls_scores, "box_deltas": box_deltas}

    def extract(self, images) -> Dict[str, jnp.ndarray]:
        """Per-class node extraction (ana_bbox_generator parity).

        Returns per image: features [K, fc_dim], boxes [K, 4],
        classes [K] (==arange when found), found [K] bool.
        """
        et = getattr(self.cfg, "extract_topk", 0)
        if et and et < self.cfg.post_nms_topk:
            # measured speed knob: pool only the top-`et` proposals.
            # generate_proposals returns boxes in descending-score
            # order (batched_nms contract), so the slice keeps exactly
            # the `et` best NMS survivors — identical to running with
            # post_nms_topk=et. ROIAlign + box head + selection all
            # scale ~linearly in R (canvas kernel is per-ROI-bound:
            # r4b roi sweep). Default 0 keeps the reference's 1000
            # (get_bbox_id.py / Detectron2 test topk).
            pyramid = self._features(images)
            _, (boxes, scores, valid) = self._proposals(pyramid,
                                                        train=False)
            boxes = boxes[:, :et]
            valid = valid[:, :et]
            feats, cls_scores, box_deltas = self.box_head(
                pyramid[:4], boxes, FPN_SCALES)
            out = {"proposals": boxes, "proposal_scores": scores[:, :et],
                   "proposal_valid": valid, "roi_features": feats,
                   "cls_scores": cls_scores, "box_deltas": box_deltas}
        else:
            out = self(images, train=False)
        k = self.num_classes
        # pre_extract_num (:536), capped at the effective proposal
        # budget so extract_topk=N is bit-identical to post_nms_topk=N
        pre = min(100, et or self.cfg.post_nms_topk)

        impl = getattr(self.cfg, "select_impl", "fused")

        def per_image(cls_scores, box_deltas, proposals, valid, feats):
            probs = jax.nn.softmax(
                cls_scores.astype(jnp.float32), axis=-1)
            # kill padded proposals before NMS
            probs = jnp.where(valid[:, None], probs, 0.0)
            dec = decode_roi_boxes(box_deltas, proposals,
                                   self.cfg.image_size)
            if impl == "topk":
                # sorted-top-`pre`-then-first-of-class composition (the
                # reference's shape; also detect()'s path)
                det = fast_rcnn_nms(dec, probs,
                                    iou_thresh=self.cfg.nms_thresh,
                                    score_thresh=self.cfg.score_thresh,
                                    max_out=pre)
                slot, found = top1_per_class(det["class_idx"],
                                             det["valid"], k)
                sel_boxes = jnp.where(found[:, None],
                                      det["boxes"][slot], 0.0)
                sel_feat = jnp.where(
                    found[:, None],
                    feats[det["proposal_idx"][slot]].astype(jnp.float32),
                    0.0)
                sel_scores = jnp.where(found, det["scores"][slot], 0.0)
                return sel_feat, sel_boxes, sel_scores, found
            # fused top-1-per-class selection: no [R*K] top_k sort, no
            # top-`pre` list materialization (exact-equivalent to the
            # composition above — see ops/nms.py::select_top1_per_class
            # and its equivalence test)
            rows, found, sel_scores = select_top1_per_class(
                dec, probs, iou_thresh=self.cfg.nms_thresh,
                score_thresh=self.cfg.score_thresh, pre=pre)
            sel_boxes = jnp.where(
                found[:, None], dec[rows, jnp.arange(k)], 0.0)
            sel_feat = jnp.where(
                found[:, None], feats[rows].astype(jnp.float32), 0.0)
            return sel_feat, sel_boxes, sel_scores, found

        feat, boxes, scores, found = jax.vmap(per_image)(
            out["cls_scores"], out["box_deltas"], out["proposals"],
            out["proposal_valid"], out["roi_features"])
        classes = jnp.broadcast_to(jnp.arange(k), found.shape)
        classes = jnp.where(found, classes, k)     # sentinel when missing
        return {"features": feat, "boxes": boxes, "scores": scores,
                "classes": classes.astype(jnp.int32), "found": found}

    def detect(self, images, max_out: int = 26) -> Dict[str, jnp.ndarray]:
        """Top-`max_out` detections per image with proposal features —
        the disease-extraction contract (bbox_generator_by_location.py:
        662-668: `inference(..., test_topk_per_image)` then
        `feats[keep // K]`).

        Returns boxes [B, M, 4], classes [B, M], scores [B, M],
        features [B, M, fc_dim], valid [B, M].
        """
        out = self(images, train=False)
        k = self.num_classes

        def per_image(cls_scores, box_deltas, proposals, valid, feats):
            probs = jax.nn.softmax(cls_scores.astype(jnp.float32), axis=-1)
            probs = jnp.where(valid[:, None], probs, 0.0)
            dec = decode_roi_boxes(box_deltas, proposals,
                                   self.cfg.image_size)
            det = fast_rcnn_nms(dec, probs,
                                iou_thresh=self.cfg.nms_thresh,
                                score_thresh=self.cfg.score_thresh,
                                max_out=max_out)
            sel_feat = feats[det["proposal_idx"]].astype(jnp.float32)
            return (det["boxes"], det["class_idx"], det["scores"],
                    sel_feat, det["valid"])

        boxes, classes, scores, feats, valid = jax.vmap(per_image)(
            out["cls_scores"], out["box_deltas"], out["proposals"],
            out["proposal_valid"], out["roi_features"])
        classes = jnp.where(valid, classes, k)
        return {"boxes": boxes, "classes": classes.astype(jnp.int32),
                "scores": scores, "features": feats, "valid": valid}

    def losses(self, images, gt_boxes, gt_classes, gt_valid, rng
               ) -> Dict[str, jnp.ndarray]:
        """Batched training losses (RPN + ROI), mean over the batch.

        gt_boxes [B, G, 4], gt_classes [B, G], gt_valid [B, G].
        """
        pyramid = self._features(images)
        (logits, deltas, anchors), (props, _, pvalid) = self._proposals(
            pyramid, train=True)
        all_anchors = jnp.concatenate(anchors, axis=0)
        all_logits = jnp.concatenate(logits, axis=1)
        all_deltas = jnp.concatenate(deltas, axis=1)

        b = images.shape[0]
        rngs = jax.random.split(rng, (b, 2))

        def rpn_one(lg, dl, gb, gv, r):
            return rpn_loss(lg, dl, all_anchors, gb, gv, r)

        rpn_l = jax.vmap(rpn_one)(all_logits, all_deltas, gt_boxes,
                                  gt_valid, rngs[:, 0])

        def roi_one(fmaps, rois, rvalid, gb, gc, gv, r):
            # sample BEFORE pooling: 512 proposals feed ROIAlign, not the
            # full post-NMS set (Detectron2 label_and_sample order)
            idx, w, cls_t, matched = sample_proposals(
                rois, rvalid, gb, gc, gv, r, self.num_classes)
            sel = rois[idx]
            _, cls_scores, box_deltas = self.box_head(fmaps, sel,
                                                      FPN_SCALES)
            return roi_loss(cls_scores, box_deltas, sel, cls_t, matched,
                            w, gb, self.num_classes)

        roi_l = jax.vmap(roi_one)(
            [p for p in pyramid[:4]], props, pvalid, gt_boxes,
            gt_classes, gt_valid, rngs[:, 1])
        out = {k: jnp.mean(v) for k, v in {**rpn_l, **roi_l}.items()}
        out["total"] = (out["rpn_obj"] + out["rpn_box"] + out["roi_cls"]
                        + out["roi_box"])
        return out
