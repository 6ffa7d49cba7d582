"""Graph-construction ops vs. a per-pair Python oracle.

The oracle re-derives the reference formulas (documented in
ekaid_tpu/ops/graph.py docstrings, cited to
"feature extraction/ana_bbox_generator.py" and model/utils/mimic_utils.py)
independently, pair by pair, so agreement checks the vectorization."""

import math

import jax.numpy as jnp
import numpy as np

from ekaid_tpu.ops import graph as G


# ---------------------------------------------------------------- oracle ---

def iou_ref(a, b):
    ixmin = max(a[0], b[0]); ixmax = min(a[2], b[2])
    iymin = max(a[1], b[1]); iymax = min(a[3], b[3])
    iw = max(ixmax - ixmin + 1.0, 0.0)
    ih = max(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    uni = ((a[2] - a[0] + 1) * (a[3] - a[1] + 1)
           + (b[2] - b[0] + 1) * (b[3] - b[1] + 1) - inter)
    return inter / uni


def center(b):
    return ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)


def relation_ref(a, b, lx=1024.0, ly=1024.0):
    if a[0] < b[0] and a[1] < b[1] and a[2] > b[2] and a[3] > b[3]:
        return 1
    if a[0] > b[0] and a[1] > b[1] and a[2] < b[2] and a[3] < b[3]:
        return 2
    if iou_ref(a, b) >= 0.5:
        return 3
    ca, cb = center(a), center(b)
    if math.hypot(cb[0] - ca[0], cb[1] - ca[1]) >= (lx + ly) / 3.0:
        return 0
    ang = math.atan2(cb[1] - ca[1], cb[0] - ca[0]) / math.pi * 180.0
    if ang < 0:
        ang += 360.0
    return min(max(math.ceil(ang / 45.0) + 3, 4), 11)


REVERSE = {0: 0, 1: 2, 2: 1, 3: 3, 4: 8, 5: 9, 6: 10, 7: 11,
           8: 4, 9: 5, 10: 6, 11: 7}


def adjacency_ref(boxes):
    n = len(boxes)
    adj = np.zeros((n, n), np.int32)
    for i in range(n):
        for j in range(i, n):
            t = relation_ref(boxes[i], boxes[j])
            adj[i, j] = t
            adj[j, i] = REVERSE[t]
    return adj


def random_boxes(rng, n, size=1024):
    x1 = rng.uniform(0, size * 0.8, n)
    y1 = rng.uniform(0, size * 0.8, n)
    w = rng.uniform(5, size * 0.5, n)
    h = rng.uniform(5, size * 0.5, n)
    return np.stack([x1, y1, np.minimum(x1 + w, size),
                     np.minimum(y1 + h, size)], -1).astype(np.float32)


# ----------------------------------------------------------------- tests ---

def test_pairwise_iou_matches_oracle(rng):
    boxes = random_boxes(rng, 12)
    got = np.asarray(G.pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    want = np.array([[iou_ref(a, b) for b in boxes] for a in boxes])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_relation_types_match_oracle(rng):
    boxes = random_boxes(rng, 20)
    got = np.asarray(G.bbox_relation_types(jnp.asarray(boxes)))
    for i in range(20):
        for j in range(20):
            assert got[i, j] == relation_ref(boxes[i], boxes[j]), (i, j)


def test_relation_containment_cases():
    outer = [10.0, 10.0, 500.0, 500.0]
    inner = [50.0, 50.0, 200.0, 200.0]
    far = [900.0, 900.0, 1000.0, 1000.0]
    boxes = jnp.asarray([outer, inner, far])
    t = np.asarray(G.bbox_relation_types(boxes))
    assert t[0, 1] == 1           # contains
    assert t[1, 0] == 2           # inside
    assert t[0, 0] == 3           # self-IoU == 1
    # outer center (255,255) -> far center (950,950): distance ~983 >= 682.6
    assert t[0, 2] == 0


def test_relation_angular_sectors():
    a = [100.0, 100.0, 120.0, 120.0]       # center (110,110)
    # 8 points at 45°-sector centers around a, radius 100
    boxes = [a]
    for k in range(8):
        ang = math.radians(22.5 + 45.0 * k)
        cx = 110 + 100 * math.cos(ang)
        cy = 110 + 100 * math.sin(ang)
        boxes.append([cx - 5, cy - 5, cx + 5, cy + 5])
    t = np.asarray(G.bbox_relation_types(jnp.asarray(boxes)))
    for k in range(8):
        assert t[0, 1 + k] == 4 + k


def test_spatial_adjacency_mirror_and_pad(rng):
    boxes = random_boxes(rng, 10)
    got = np.asarray(G.spatial_adjacency(jnp.asarray(boxes), pad_to=16))
    want = adjacency_ref(boxes)
    np.testing.assert_array_equal(got[:10, :10], want)
    assert got.shape == (16, 16)
    assert (got[10:, :] == 0).all() and (got[:, 10:] == 0).all()


def test_spatial_adjacency_batched(rng):
    boxes = np.stack([random_boxes(rng, 8) for _ in range(3)])
    got = np.asarray(G.spatial_adjacency(jnp.asarray(boxes)))
    for b in range(3):
        np.testing.assert_array_equal(got[b], adjacency_ref(boxes[b]))


def test_broadcast_adjacency_one_hot():
    labels = jnp.asarray([[[0, 3], [1, 11]]])        # [1, 2, 2]
    out = np.asarray(G.broadcast_adjacency(labels, num_labels=11))
    assert out.shape == (1, 2, 2, 11)
    assert out[0, 0, 0].sum() == 0                   # label 0 -> no edge
    assert out[0, 0, 1, 2] == 1 and out[0, 0, 1].sum() == 1
    assert out[0, 1, 0, 0] == 1
    assert out[0, 1, 1, 10] == 1


def test_broadcast_adjacency_slices_live_nodes():
    labels = jnp.zeros((1, 100, 100), jnp.int32)
    out = G.broadcast_adjacency(labels, num_labels=3, num_objects=52)
    assert out.shape == (1, 52, 52, 3)


def test_position_matrix_matches_formula(rng):
    boxes = random_boxes(rng, 6)[None]
    got = np.asarray(G.position_matrix(jnp.asarray(boxes), nongt_dim=6))
    x1, y1, x2, y2 = boxes[0].T
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    for i in range(6):
        for j in range(6):
            dx = abs((cx[i] - cx[j]) / w[i])
            dy = abs((cy[i] - cy[j]) / h[i])
            want = [math.log(max(dx, 1e-3)), math.log(max(dy, 1e-3)),
                    math.log(w[i] / w[j]), math.log(h[i] / h[j])]
            np.testing.assert_allclose(got[0, i, j], want, rtol=1e-3,
                                       atol=1e-4)


def test_position_embedding_shape_and_values():
    pos = jnp.zeros((2, 5, 5, 4))
    emb = np.asarray(G.position_embedding(pos, feat_dim=64))
    assert emb.shape == (2, 5, 5, 64)
    # sin(0)=0 / cos(0)=1 interleave: per 16-block, first 8 are sin, next 8 cos
    blk = emb.reshape(2, 5, 5, 4, 16)
    np.testing.assert_allclose(blk[..., :8], 0.0, atol=1e-7)
    np.testing.assert_allclose(blk[..., 8:], 1.0, atol=1e-7)


def test_position_embedding_frequency_spectrum():
    pos = jnp.full((1, 1, 1, 4), 0.01)
    emb = np.asarray(G.position_embedding(pos, feat_dim=64,
                                          wave_length=1000.0))
    blk = emb.reshape(4, 16)
    for f in range(8):
        scale = 1000.0 ** (f / 8.0)
        np.testing.assert_allclose(blk[0, f], math.sin(1.0 / scale),
                                   rtol=1e-5)
        np.testing.assert_allclose(blk[0, 8 + f], math.cos(1.0 / scale),
                                   rtol=1e-5)


def test_semantic_adjacency_tables():
    # toy world: classes 0,1 anatomy (organs 0,1); 2,3 disease (organs 0,1);
    # class 4 = sentinel (organ -1). cooccur: classes 2,3 co-occur (label 2).
    organ = jnp.asarray([0, 1, 0, 1, -1])
    dis = jnp.asarray([False, False, True, True, False])
    co = np.zeros((5, 5), np.int32)
    co[2, 3] = co[3, 2] = co[2, 2] = co[3, 3] = 2
    ids = jnp.asarray([[0, 1, 2, 3, 4]])
    adj = np.asarray(G.semantic_adjacency(ids, organ, jnp.asarray(co), dis))
    assert adj[0, 0, 2] == 1 and adj[0, 2, 0] == 1     # same organ, ana-dis
    assert adj[0, 1, 3] == 1
    assert adj[0, 0, 1] == 0                           # ana-ana: no edge
    assert adj[0, 2, 3] == 2 and adj[0, 3, 2] == 2     # co-occurrence wins
    assert adj[0, 2, 2] == 2                           # diagonal co-occur
    assert (adj[0, 4, :] == 0).all() and (adj[0, :, 4] == 0).all()


def test_semantic_adjacency_padding():
    organ = jnp.asarray([0, -1])
    dis = jnp.asarray([True, False])
    co = jnp.zeros((2, 2), jnp.int32)
    adj = G.semantic_adjacency(jnp.asarray([[0, 0]]), organ, co, dis,
                               pad_to=7)
    assert adj.shape == (1, 7, 7)
