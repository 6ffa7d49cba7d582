"""Vectorized difference-graph construction.

Replaces the reference's per-pair Python loops with all-pairs jnp ops:

* spatial relation typing — reference `bbox_relation_type` / `reverse_type`
  ("feature extraction/ana_bbox_generator.py":266-296) and the O(N²) loop in
  `get_adj_matrix` (:320-335). Twelve discrete labels:
      0  disconnected (center distance >= (lx+ly)/3)
      1  i strictly contains j            2  i strictly inside j
      3  IoU >= 0.5 (same region)
      4..11  one of eight 45° angular sectors from center(i) to center(j)
  Priority order is exactly the reference's: contains > inside > iou >
  disconnected > angle. The lower triangle uses the label-reversal table,
  not a recomputation — matching `get_adj_matrix`'s write pattern.

* adjacency one-hot broadcast — reference `torch_broadcast_adj_matrix` /
  `process_matrix` (model/utils/mimic_utils.py:119-149). The reference
  re-broadcasts every training step on device; here it is a single
  `one_hot` the XLA fuser folds into the consuming matmul.

* geometric position features — reference `torch_extract_position_matrix`
  (mimic_utils.py:152-190) and the sinusoidal `torch_extract_position_embedding`
  (:192-208).

* semantic adjacency — reference `get_semantic_adj`
  ("feature extraction/combine_dicts.py":106-151): organ-level expert-KG
  edges (label 1) between anatomy and disease nodes mapped to the same
  organ, overridden by CheXpert co-occurrence edges (label 2). The
  KG/co-occurrence lookups are precomputed into dense tables by
  `ekaid_tpu.data.knowledge` so the per-image op is pure gather.

All functions are shape-polymorphic over leading batch dims and jit-safe
(static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Label-reversal table (reference reverse_type, ana_bbox_generator.py:278-296):
# 0->0, 1<->2, 3->3, sectors 4..11 rotate by 4 (180°). Kept as a plain list
# so importing this module (and host pipeline threads) never touches JAX.
_REVERSE_TABLE = (0, 2, 1, 3, 8, 9, 10, 11, 4, 5, 6, 7)


def _split_boxes(boxes: jnp.ndarray):
    x1 = boxes[..., 0]
    y1 = boxes[..., 1]
    x2 = boxes[..., 2]
    y2 = boxes[..., 3]
    return x1, y1, x2, y2


def pairwise_iou(boxes_a, boxes_b, xp=jnp):
    """All-pairs IoU with the reference's +1 pixel convention
    (get_iou, ana_bbox_generator.py:213-240).

    boxes_a: [..., N, 4], boxes_b: [..., M, 4] -> [..., N, M].
    `xp` selects the array module (jnp on device, numpy for host-side
    pipeline threads that must not touch JAX).
    """
    ax1, ay1, ax2, ay2 = _split_boxes(boxes_a[..., :, None, :])
    bx1, by1, bx2, by2 = _split_boxes(boxes_b[..., None, :, :])
    ixmin = xp.maximum(ax1, bx1)
    ixmax = xp.minimum(ax2, bx2)
    iymin = xp.maximum(ay1, by1)
    iymax = xp.minimum(ay2, by2)
    iw = xp.maximum(ixmax - ixmin + 1.0, 0.0)
    ih = xp.maximum(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    union = area_a + area_b - inter
    return inter / union


def _centers(boxes: jnp.ndarray):
    x1, y1, x2, y2 = _split_boxes(boxes)
    return (x1 + x2) * 0.5, (y1 + y2) * 0.5


def pairwise_center_distance(boxes, xp=jnp):
    """All-pairs Euclidean center distance (get_distance,
    ana_bbox_generator.py:244-250). boxes: [..., N, 4] -> [..., N, N]."""
    cx, cy = _centers(boxes)
    dx = cx[..., :, None] - cx[..., None, :]
    dy = cy[..., :, None] - cy[..., None, :]
    return xp.sqrt(dx * dx + dy * dy)


def pairwise_angle(boxes, xp=jnp):
    """All-pairs angle in degrees [0, 360) from center(i) to center(j)
    (get_angle/cal_angle, ana_bbox_generator.py:252-263)."""
    cx, cy = _centers(boxes)
    dx = cx[..., None, :] - cx[..., :, None]   # x_j - x_i
    dy = cy[..., None, :] - cy[..., :, None]   # y_j - y_i
    ang = xp.arctan2(dy, dx) / math.pi * 180.0
    return xp.where(ang < 0, ang + 360.0, ang)


def bbox_relation_types(boxes, img_w: float = 1024.0,
                        img_h: float = 1024.0, xp=jnp):
    """All-pairs directed relation label in {0..11}
    (bbox_relation_type, ana_bbox_generator.py:266-276).

    boxes: [..., N, 4] float -> [..., N, N] int32. Entry (i, j) is the
    relation of box j relative to box i, evaluated for *all* ordered pairs
    (the triangular mirroring of the reference is applied by
    `spatial_adjacency`).
    """
    boxes = boxes.astype(xp.float32)
    x1, y1, x2, y2 = _split_boxes(boxes)

    def pair(u, v):
        return u[..., :, None], v[..., None, :]

    ix1, jx1 = pair(x1, x1)
    iy1, jy1 = pair(y1, y1)
    ix2, jx2 = pair(x2, x2)
    iy2, jy2 = pair(y2, y2)

    contains = (ix1 < jx1) & (iy1 < jy1) & (ix2 > jx2) & (iy2 > jy2)
    inside = (ix1 > jx1) & (iy1 > jy1) & (ix2 < jx2) & (iy2 < jy2)
    overlap = pairwise_iou(boxes, boxes, xp=xp) >= 0.5
    far = pairwise_center_distance(boxes, xp=xp) >= (img_w + img_h) / 3.0
    # ceil(angle/45)+3 in 4..11; angle==0 -> ceil==0 -> clamp to sector 1.
    ang = pairwise_angle(boxes, xp=xp)
    sector = xp.ceil(ang / 45.0).astype(xp.int32) + 3
    sector = xp.clip(sector, 4, 11)

    out = sector
    out = xp.where(far, 0, out)
    out = xp.where(overlap, 3, out)
    out = xp.where(inside, 2, out)
    out = xp.where(contains, 1, out)
    return out.astype(xp.int32)


def reverse_relation_type(labels, xp=jnp):
    """Label reversal (reverse_type, ana_bbox_generator.py:278-296)."""
    return xp.asarray(_REVERSE_TABLE, dtype=xp.int32)[labels]


def spatial_adjacency(boxes, pad_to: int | None = None,
                      img_w: float = 1024.0,
                      img_h: float = 1024.0, xp=jnp):
    """Full spatial adjacency matching the reference's write pattern
    (get_adj_matrix, ana_bbox_generator.py:320-335): upper triangle
    (incl. diagonal) from `bbox_relation_type(b_i, b_j)`, lower triangle
    from the reversal table applied to the mirrored upper entry.

    boxes: [..., N, 4] -> [..., P, P] int32 where P = pad_to or N
    (the reference stores 100x100 zero-padded matrices).
    """
    n = boxes.shape[-2]
    types = bbox_relation_types(boxes, img_w=img_w, img_h=img_h, xp=xp)
    upper = xp.triu(xp.ones((n, n), dtype=bool))
    adj = xp.where(upper, types,
                   reverse_relation_type(xp.swapaxes(types, -1, -2), xp=xp))
    if pad_to is not None and pad_to > n:
        pad = [(0, 0)] * (adj.ndim - 2) + [(0, pad_to - n), (0, pad_to - n)]
        adj = xp.pad(adj, pad)
    return adj


def broadcast_adjacency(adj_labels: jnp.ndarray, num_labels: int,
                        num_objects: int | None = None,
                        dtype=jnp.float32) -> jnp.ndarray:
    """One-hot label broadcast (torch_broadcast_adj_matrix / process_matrix,
    mimic_utils.py:119-149): labels 1..L map to channels 0..L-1; label 0
    (no edge) maps to the all-zero vector.

    adj_labels: [..., P, P] int -> [..., N, N, L] with N = num_objects or P.
    """
    if num_objects is not None:
        adj_labels = adj_labels[..., :num_objects, :num_objects]
    return jax.nn.one_hot(adj_labels.astype(jnp.int32) - 1, num_labels,
                          dtype=dtype)


def position_matrix(boxes: jnp.ndarray, nongt_dim: int = 52,
                    eps: float = 1e-3) -> jnp.ndarray:
    """Pairwise log-geometry features (torch_extract_position_matrix,
    mimic_utils.py:152-190).

    boxes: [..., N, 4] -> [..., N, min(N, nongt_dim), 4] float32 with
    channels (log|Δx/w|, log|Δy/h|, log(w_i/w_j), log(h_i/h_j)).
    """
    boxes = boxes.astype(jnp.float32)
    x1, y1, x2, y2 = _split_boxes(boxes)
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    cx = 0.5 * (x1 + x2)
    cy = 0.5 * (y1 + y2)

    dx = (cx[..., :, None] - cx[..., None, :]) / w[..., :, None]
    dx = jnp.log(jnp.maximum(jnp.abs(dx), eps))
    dy = (cy[..., :, None] - cy[..., None, :]) / h[..., :, None]
    dy = jnp.log(jnp.maximum(jnp.abs(dy), eps))
    dw = jnp.log(w[..., :, None] / w[..., None, :])
    dh = jnp.log(h[..., :, None] / h[..., None, :])

    pos = jnp.stack([dx, dy, dw, dh], axis=-1)
    return pos[..., :nongt_dim, :]


def position_embedding(pos_mat: jnp.ndarray, feat_dim: int = 64,
                       wave_length: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal embedding of the geometry features
    (torch_extract_position_embedding, mimic_utils.py:192-208).

    pos_mat: [..., N, M, 4] -> [..., N, M, feat_dim]; feat_dim % 8 == 0.
    """
    assert feat_dim % 8 == 0, "feat_dim must be divisible by 8"
    n_freq = feat_dim // 8
    feat_range = jnp.arange(n_freq, dtype=jnp.float32)
    dim_mat = jnp.power(wave_length, (8.0 / feat_dim) * feat_range)
    div = (100.0 * pos_mat[..., None]) / dim_mat      # [..., N, M, 4, F]
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)
    return emb.reshape(*emb.shape[:-2], feat_dim)


def semantic_adjacency(class_ids: jnp.ndarray,
                       organ_table: jnp.ndarray,
                       cooccur_table: jnp.ndarray,
                       is_disease: jnp.ndarray,
                       pad_to: int | None = None) -> jnp.ndarray:
    """Expert-knowledge semantic adjacency (get_semantic_adj,
    combine_dicts.py:106-151).

    Args:
      class_ids:     [..., N] int — combined class index per node (anatomy
                     classes then disease classes; `num_classes` = the
                     "missing node" sentinel that gets no edges).
      organ_table:   [C+1] int — organ id per class (knowledge.py); the
                     sentinel row maps to organ -1.
      cooccur_table: [C+1, C+1] int — 2 where CheXpert co-occurrence exceeds
                     the 0.18 threshold (combine_dicts.py:238), else 0.
      is_disease:    [C+1] bool — disease-class indicator.

    Returns [..., P, P] int32 with labels {0,1,2}; label 2 (co-occurrence)
    overrides label 1 via max(), exactly as combine_dicts.py:144-147.
    """
    organs = organ_table[class_ids]
    disease = is_disease[class_ids]
    valid = organs >= 0

    same_organ = organs[..., :, None] == organs[..., None, :]
    cross = disease[..., :, None] ^ disease[..., None, :]
    both_valid = valid[..., :, None] & valid[..., None, :]
    organ_edge = jnp.where(same_organ & cross & both_valid, 1, 0)

    co = cooccur_table[class_ids[..., :, None], class_ids[..., None, :]]
    adj = jnp.maximum(organ_edge, jnp.where(both_valid, co, 0))
    adj = adj.astype(jnp.int32)
    if pad_to is not None and pad_to > adj.shape[-1]:
        n = adj.shape[-1]
        pad = [(0, 0)] * (adj.ndim - 2) + [(0, pad_to - n), (0, pad_to - n)]
        adj = jnp.pad(adj, pad)
    return adj
