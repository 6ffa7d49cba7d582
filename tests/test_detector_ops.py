"""NMS / ROIAlign tests vs. pure-Python oracles of the standard algorithms."""

import numpy as np
import jax.numpy as jnp

from ekaid_tpu.ops.nms import (batched_nms, box_iou, fast_rcnn_nms, nms,
                               top1_per_class)
from ekaid_tpu.ops.roi_align import (assign_levels, multilevel_roi_align,
                                     roi_align)


# ---------------------------------------------------------------- oracle ---

def iou_np(a, b):
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iw * ih
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) \
        - inter
    return inter / ua if ua > 0 else 0.0


def nms_oracle(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    removed = set()
    for i in order:
        if i in removed:
            continue
        keep.append(i)
        for j in order:
            if j not in removed and j != i and \
                    iou_np(boxes[i], boxes[j]) > thresh:
                removed.add(j)
    return keep


def random_boxes(rng, n, size=200):
    x1 = rng.uniform(0, size * 0.7, n)
    y1 = rng.uniform(0, size * 0.7, n)
    w = rng.uniform(5, size * 0.4, n)
    h = rng.uniform(5, size * 0.4, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def roi_align_oracle(fmap, roi, scale, out, s):
    """Single-ROI ROIAlignV2 (aligned): mean of s*s bilinear samples."""
    H, W, C = fmap.shape
    x1 = roi[0] * scale - 0.5
    y1 = roi[1] * scale - 0.5
    bw = (roi[2] - roi[0]) * scale / out
    bh = (roi[3] - roi[1]) * scale / out
    res = np.zeros((out, out, C))
    for by in range(out):
        for bx in range(out):
            acc = np.zeros(C)
            for iy in range(s):
                for ix in range(s):
                    y = y1 + (by + (iy + 0.5) / s) * bh
                    x = x1 + (bx + (ix + 0.5) / s) * bw
                    if y < -1.0 or y > H or x < -1.0 or x > W:
                        continue
                    y0, x0 = int(np.floor(y)), int(np.floor(x))
                    ly, lx = y - y0, x - x0
                    def at(yy, xx):
                        return fmap[min(max(yy, 0), H - 1),
                                    min(max(xx, 0), W - 1)]
                    acc += (at(y0, x0) * (1 - ly) * (1 - lx)
                            + at(y0, x0 + 1) * (1 - ly) * lx
                            + at(y0 + 1, x0) * ly * (1 - lx)
                            + at(y0 + 1, x0 + 1) * ly * lx)
            res[by, bx] = acc / (s * s)
    return res


# ------------------------------------------------------------------ NMS ---

def test_box_iou_matches_oracle(rng):
    a = random_boxes(rng, 8)
    b = random_boxes(rng, 5)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[iou_np(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nms_matches_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 40)
        scores = rng.uniform(0.1, 1.0, 40).astype(np.float32)
        want = nms_oracle(boxes, scores, 0.5)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40)
        got = [int(i) for i, v in zip(idx, valid) if v]
        assert got == want, trial


def test_nms_max_out_truncation(rng):
    boxes = random_boxes(rng, 30)
    scores = rng.uniform(0.1, 1.0, 30).astype(np.float32)
    want = nms_oracle(boxes, scores, 0.5)[:5]
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    got = [int(i) for i, v in zip(idx, valid) if v]
    assert got == want


def test_batched_nms_classes_dont_suppress(rng):
    # identical boxes, different classes -> both kept
    b = np.array([[10, 10, 50, 50], [10, 10, 50, 50]], np.float32)
    s = np.array([0.9, 0.8], np.float32)
    c = np.array([0, 1])
    idx, valid = batched_nms(jnp.asarray(b), jnp.asarray(s),
                             jnp.asarray(c), 0.5, 4)
    assert valid.sum() == 2
    # same class -> one suppressed
    idx, valid = batched_nms(jnp.asarray(b), jnp.asarray(s),
                             jnp.asarray(np.array([0, 0])), 0.5, 4)
    assert valid.sum() == 1


def test_fast_rcnn_nms_contract(rng):
    r, k = 20, 3
    boxes = np.stack([random_boxes(rng, r) for _ in range(k)], axis=1)
    scores = rng.uniform(0, 1, (r, k + 1)).astype(np.float32)
    scores /= scores.sum(-1, keepdims=True)
    out = fast_rcnn_nms(jnp.asarray(boxes), jnp.asarray(scores),
                        iou_thresh=0.5, score_thresh=0.05, max_out=30)
    v = np.asarray(out["valid"])
    pi = np.asarray(out["proposal_idx"])[v]
    ci = np.asarray(out["class_idx"])[v]
    sc = np.asarray(out["scores"])[v]
    # scores sorted descending, all above threshold
    assert (np.diff(sc) <= 1e-6).all()
    assert (sc > 0.05).all()
    # proposal/class indices recover the original score table
    np.testing.assert_allclose(scores[pi, ci], sc, rtol=1e-6)
    # boxes match the class-specific inputs
    np.testing.assert_allclose(np.asarray(out["boxes"])[v],
                               boxes[pi, ci], rtol=1e-6)


def test_top1_per_class():
    class_idx = jnp.asarray([2, 0, 2, 1, 0])
    valid = jnp.asarray([True, True, True, False, True])
    slot, found = top1_per_class(class_idx, valid, 4)
    assert slot[2] == 0 and slot[0] == 1
    assert not found[1] and not found[3]
    assert found[0] and found[2]


def test_select_top1_direct_equivalence(rng):
    """select_top1_per_class (fused, sort-free) must reproduce the
    fast_rcnn_nms + top1_per_class composition exactly — rows, found
    set, scores — including the pre_extract_num rank cap and flat-index
    tie order, across many random score tables (with forced exact-tie
    duplicates)."""
    from ekaid_tpu.ops.nms import select_top1_per_class
    for seed in range(12):
        r2 = np.random.default_rng(seed)
        r, k = 64, 6
        pre = 8 if seed % 3 == 0 else 30   # exercise the rank cap hard
        boxes = np.stack([random_boxes(r2, r) for _ in range(k)], axis=1)
        scores = r2.uniform(0, 1, (r, k + 1)).astype(np.float32)
        # force exact ties: duplicate a handful of score entries
        flat = scores[:, :k].reshape(-1)
        dup = r2.choice(flat.size, 8, replace=False)
        flat[dup[4:]] = flat[dup[:4]]
        scores[:, :k] = flat.reshape(r, k)
        scores /= scores.sum(-1, keepdims=True)

        det = fast_rcnn_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            iou_thresh=0.5, score_thresh=0.05,
                            max_out=pre)
        slot, found_o = top1_per_class(det["class_idx"], det["valid"], k)
        rows_o = np.asarray(det["proposal_idx"])[np.asarray(slot)]
        scores_o = np.asarray(det["scores"])[np.asarray(slot)]
        found_o = np.asarray(found_o)

        rows_n, found_n, scores_n = select_top1_per_class(
            jnp.asarray(boxes), jnp.asarray(scores),
            iou_thresh=0.5, score_thresh=0.05, pre=pre)
        np.testing.assert_array_equal(np.asarray(found_n), found_o,
                                      err_msg=f"seed {seed}")
        np.testing.assert_array_equal(
            np.asarray(rows_n)[found_o], rows_o[found_o],
            err_msg=f"seed {seed}")
        np.testing.assert_allclose(
            np.asarray(scores_n)[found_o], scores_o[found_o],
            rtol=1e-6, err_msg=f"seed {seed}")


# ------------------------------------------------------------- ROIAlign ---

def test_roi_align_matches_oracle(rng):
    fmap = rng.standard_normal((16, 20, 3)).astype(np.float32)
    rois = np.array([[4.0, 8.0, 36.0, 28.0],
                     [0.0, 0.0, 80.0, 64.0],
                     [10.0, 10.0, 11.0, 11.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois),
                               spatial_scale=0.25, out_size=4,
                               sampling_ratio=2))
    for i, roi in enumerate(rois):
        want = roi_align_oracle(fmap, roi, 0.25, 4, 2)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_roi_align_constant_map(rng):
    fmap = np.full((8, 8, 2), 3.0, np.float32)
    rois = np.array([[4.0, 4.0, 24.0, 24.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois), 0.25,
                               out_size=2))
    np.testing.assert_allclose(got, 3.0, rtol=1e-6)


def test_assign_levels():
    rois = jnp.asarray([[0, 0, 32, 32],       # tiny -> level 2
                        [0, 0, 224, 224],     # canonical -> level 4
                        [0, 0, 900, 900]])    # huge -> level 5
    lv = np.asarray(assign_levels(rois))
    assert lv.tolist() == [2, 4, 5]


def test_multilevel_roi_align_selects_right_level(rng):
    # constant-valued maps with distinct values per level
    fmaps = [jnp.full((64 >> i, 64 >> i, 1), float(i + 1))
             for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = jnp.asarray([[8, 8, 48, 48],        # lvl 2 -> value 1
                        [8, 8, 208, 208]])     # lvl 3 -> value 2
    out = np.asarray(multilevel_roi_align(fmaps, rois, scales, out_size=2))
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[1], 2.0, rtol=1e-5)


def test_multilevel_matches_single_level_oracle(rng):
    """Every ROI pooled by multilevel must equal the per-sample oracle
    run against its assigned level's map (exercises the matmul-folded
    sample averaging and the flattened-table gather)."""
    fmaps = [rng.standard_normal((64 >> i, 64 >> i, 3)).astype(np.float32)
             for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = np.array([[8, 8, 48, 48],
                     [4, 4, 120, 90],
                     [8, 8, 208, 208],
                     [0, 0, 800, 700],
                     [30, 40, 31.5, 41.5]], np.float32)
    lv = np.asarray(assign_levels(jnp.asarray(rois)))
    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7))
    for i, roi in enumerate(rois):
        li = lv[i] - 2
        want = roi_align_oracle(fmaps[li], roi, scales[li], 7, 2)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_multilevel_chunked_equals_unchunked(rng):
    """lax.map ROI chunking must be a pure implementation detail."""
    fmaps = [rng.standard_normal((32 >> i, 32 >> i, 4)).astype(np.float32)
             for i in range(3)]
    scales = [0.25, 0.125, 0.0625]
    rois = jnp.asarray(random_boxes(rng, 12, size=128))
    full = np.asarray(multilevel_roi_align(fmaps, rois, scales,
                                           out_size=4, roi_chunk=0))
    chunked = np.asarray(multilevel_roi_align(fmaps, rois, scales,
                                              out_size=4, roi_chunk=4))
    # fp reassociation between the lax.map-compiled and eager paths
    np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-5)


def test_blocked_nms_equals_argmax_reference(rng):
    """The blocked survivor-set NMS must make identical selections to the
    sequential argmax formulation at every size/tie pattern."""
    from ekaid_tpu.ops.nms import nms_argmax
    for n in (17, 64, 256, 300, 700):
        boxes = random_boxes(rng, n, size=1024)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        scores = np.round(scores * 50) / 50          # force ties
        k = min(n, 150)
        i1, v1 = nms_argmax(jnp.asarray(boxes), jnp.asarray(scores),
                            0.5, k)
        i2, v2 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                      np.asarray(i2)[np.asarray(v2)])


def test_blocked_nms_score_thresh(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0.0, 1.0, 40).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40,
                     score_thresh=0.5)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert (scores[kept] > 0.5).all()


def test_pallas_nms_interpret_matches_blocked(rng, monkeypatch):
    """The Pallas VMEM kernel (interpret mode on CPU) must select exactly
    what the blocked/argmax NMS selects."""
    import jax.experimental.pallas as pl
    from ekaid_tpu.ops import pallas_nms as pn

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pn.pl, "pallas_call", interp)
    boxes = random_boxes(rng, 80, size=1024)
    scores = rng.uniform(0.01, 1.0, 80).astype(np.float32)
    i1, v1 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 30)
    i2, v2 = pn.nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                           0.5, 30)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                  np.asarray(i2)[np.asarray(v2)])


def test_affine_warp_identity_and_rotation():
    """Rotation augmentation fixtures (train-vindr-online.py:280
    ShiftScaleRotate parity): identity warp is exact; a 90-degree
    rotation maps boxes to their rotated hull."""
    from ekaid_tpu.train.train_detector import affine_warp

    S = 64
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (S, S, 3)).astype(np.float32)
    boxes = np.asarray([[10.0, 20.0, 30.0, 28.0]])

    # identity
    out, ob = affine_warp(img, boxes, 0.0, 1.0, 0.0, 0.0, S)
    np.testing.assert_allclose(out, img, atol=1e-5)
    np.testing.assert_allclose(ob, boxes, atol=1e-5)

    # 90 deg about center c = (S-1)/2: (x, y) -> (c - (y - c), c + (x - c))
    out, ob = affine_warp(img, boxes, 90.0, 1.0, 0.0, 0.0, S)
    c = (S - 1) / 2
    xs = [c - (20 - c), c - (28 - c)]
    ys = [c + (10 - c), c + (30 - c)]
    want = [min(xs), min(ys), max(xs), max(ys)]
    np.testing.assert_allclose(ob[0], want, atol=1e-4)
    # pixel content rotated: sample a point and compare
    # dst (x', y') pulls from src (x, y) with the inverse map
    np.testing.assert_allclose(out[40, 20], img[int(c + (c - 20)),
                                                int(40)], atol=1e-4)

    # pure shift moves boxes by (dx, dy)
    out, ob = affine_warp(img, boxes, 0.0, 1.0, 5.0, -3.0, S)
    np.testing.assert_allclose(ob[0], [15, 17, 35, 25], atol=1e-5)
    # scale about center grows the box (fixture stays in frame unclipped)
    out, ob = affine_warp(img, np.asarray([[25.0, 25.0, 45.0, 35.0]]),
                          0.0, 1.5, 0.0, 0.0, S)
    np.testing.assert_allclose(ob[0, 2] - ob[0, 0], 30.0, atol=1e-4)
    np.testing.assert_allclose(ob[0, 3] - ob[0, 1], 15.0, atol=1e-4)


def test_augment_rotation_keeps_boxes_valid():
    from ekaid_tpu.train.train_detector import augment

    S = 64
    rng = np.random.default_rng(1)
    images = rng.uniform(0, 1, (4, S, S, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([[8.0, 8.0, 40.0, 48.0]]), (4, 1, 1))
    out_i, out_b = augment(images, boxes, rng, S)
    assert out_i.shape == images.shape
    assert (out_b[..., 2] >= out_b[..., 0]).all()
    assert (out_b[..., 3] >= out_b[..., 1]).all()
    assert out_b.min() >= 0 and out_b.max() <= S


def test_pallas_roi_matches_xla(rng):
    """Patch-DMA Pallas ROIAlign must match the XLA gather formulation
    (interpret mode; includes p5-clamped huge ROIs and edge clamps)."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_pallas
    fmaps = [rng.standard_normal((256 >> i, 256 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = np.array([
        [8, 8, 48, 48],          # small -> p2
        [4, 4, 120, 90],
        [8, 8, 208, 208],
        [0, 0, 800, 700],        # large -> p5
        [0, 0, 1023, 1023],      # full image, p5-clamped span
        [1000, 1000, 1023, 1023],  # bottom-right edge
        [-5, -5, 30, 30],        # off-image corner (clamped samples)
        [30, 40, 31.5, 41.5],    # tiny
    ], np.float32)
    want = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7))
    got = np.asarray(multilevel_roi_align_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_roi_batched_matches_per_image(rng):
    """Batched mode (leading image dim + per-ROI image index) must equal
    per-image pooling — including a ROI count that needs GROUP padding."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_pallas
    b = 3
    fmaps = [rng.standard_normal((b, 128 >> i, 128 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = rng.uniform(0, 200, (b, 5, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[..., :2], rois[..., 2:]),
                           np.maximum(rois[..., :2], rois[..., 2:]) + 2],
                          axis=-1)
    got = np.asarray(multilevel_roi_align_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    for i in range(b):
        want = np.asarray(multilevel_roi_align(
            [jnp.asarray(f[i]) for f in fmaps], jnp.asarray(rois[i]),
            scales, out_size=7))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_pallas_roi_elongated_boxes_bump_level(rng):
    """High-aspect ROIs overflow the fixed patch at their sqrt-area
    level; the kernel must bump them to a coarser level that fits (a
    documented deviation) — NEVER silently zero the overflow. Oracle:
    single-level roi_align at the bumped level."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_pallas
    from ekaid_tpu.ops.roi_align import roi_align

    fmaps = [rng.standard_normal((256 >> i, 256 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = np.array([
        [0, 300, 1000, 350],     # 1000x50, aspect 20
        [100, 0, 160, 900],      # 60x900, aspect 15 (tall)
        [0, 0, 700, 100],        # 700x100, aspect 7
        [10, 10, 40, 40],        # control: small square, no bump
    ], np.float32)
    got = np.asarray(multilevel_roi_align_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    # expected level: max(assigned, first whose scale fits long side
    # in the 44-px patch budget)
    for i, roi in enumerate(rois):
        w, h = roi[2] - roi[0], roi[3] - roi[1]
        size = np.sqrt(w * h)
        assigned = int(np.clip(np.floor(
            4 + np.log2(max(size, 1e-6) / 224)), 2, 5)) - 2
        need = int(np.ceil(np.log2(max(
            max(w, h) * scales[0] / 44.0, 1e-6))))
        lvl = int(np.clip(max(assigned, need), 0, 3))
        want = np.asarray(roi_align(
            jnp.asarray(fmaps[lvl]), jnp.asarray(roi[None]),
            scales[lvl], out_size=7))[0]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"roi {i} lvl {lvl}")
    # and crucially: no silently-zeroed columns on the wide ROI
    assert np.abs(got[0]).max(axis=(0, 2)).min() > 0


def test_multilevel_roi_align_prime_roi_count(rng):
    """A prime R must still chunk via padding (a divisor search would
    degenerate to an R-step sequential lax.map — a >10 min remote
    compile on axon); result identical to unchunked."""
    fmaps = [rng.standard_normal((64 >> i, 64 >> i, 4)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    r = 263                                            # prime > 256
    rois = random_boxes(rng, r, size=250)
    chunked = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=4))                                   # auto chunk=256
    plain = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=4, roi_chunk=0))
    assert chunked.shape == (r, 4, 4, 4)
    np.testing.assert_allclose(chunked, plain, rtol=1e-4, atol=1e-5)


def test_pallas_roi_single_image_over_smem_budget(rng):
    """>16384 ROIs on ONE image must chunk over the ROI dim (SMEM
    scalar-prefetch budget); equality vs the XLA path on all ROIs the
    level-bump deviation doesn't touch."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_pallas

    fmaps = [rng.standard_normal((64 >> i, 64 >> i, 2)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    r = 16500
    rois = rng.uniform(0, 200, (r, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[:, :2], rois[:, 2:]),
                           np.maximum(rois[:, :2], rois[:, 2:]) + 2], 1)
    long_side = np.maximum(rois[:, 2] - rois[:, 0],
                           rois[:, 3] - rois[:, 1])
    lv = np.asarray(assign_levels(jnp.asarray(rois))) - 2
    need = np.ceil(np.log2(np.maximum(long_side * 0.25 / 44.0,
                                      1e-6))).astype(int)
    unbumped = np.clip(np.maximum(lv, need), 0, 3) == lv
    got = np.asarray(multilevel_roi_align_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=4, interpret=True))
    want = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=4))
    assert got.shape == (r, 4, 4, 2)
    np.testing.assert_allclose(got[unbumped], want[unbumped],
                               rtol=1e-4, atol=1e-5)


def test_canvas_roi_matches_xla(rng):
    """The whole-pyramid-in-VMEM canvas kernel must match the XLA
    gather formulation (interpret mode; same hard ROI set as the
    patch-DMA test, incl. clamps/edges/huge boxes)."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [rng.standard_normal((256 >> i, 256 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = np.array([
        [8, 8, 48, 48],
        [4, 4, 120, 90],
        [8, 8, 208, 208],
        [0, 0, 800, 700],
        [0, 0, 1023, 1023],
        [1000, 1000, 1023, 1023],
        [-5, -5, 30, 30],
        [30, 40, 31.5, 41.5],
        [0, 300, 1000, 350],     # elongated -> level bump
        [100, 0, 160, 900],
    ], np.float32)
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_pallas
    want = np.asarray(multilevel_roi_align_pallas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    got = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and vs the XLA oracle on the non-bumped subset
    want_x = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois[:8]), scales,
        out_size=7))
    np.testing.assert_allclose(got[:8], want_x, rtol=1e-4, atol=1e-5)


def test_canvas_roi_batched_matches_per_image(rng):
    """Batched canvas pooling (grid over images) must equal per-image
    XLA pooling, including GROUP padding of the ROI dim."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    b = 3
    fmaps = [rng.standard_normal((b, 128 >> i, 128 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = rng.uniform(0, 200, (b, 5, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[..., :2], rois[..., 2:]),
                           np.maximum(rois[..., :2], rois[..., 2:]) + 2],
                          axis=-1)
    got = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    for i in range(b):
        want = np.asarray(multilevel_roi_align(
            [jnp.asarray(f[i]) for f in fmaps], jnp.asarray(rois[i]),
            scales, out_size=7))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_canvas_roi_kron_pooling_matches(rng):
    """pooling='kron' (single fused per-ROI matmul) must match the
    separable two-matmul form exactly in f32."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [rng.standard_normal((128 >> i, 128 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = rng.uniform(0, 400, (6, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[:, :2], rois[:, 2:]),
                           np.maximum(rois[:, :2], rois[:, 2:]) + 2],
                          axis=-1)
    sep = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    kron = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True, pooling="kron"))
    np.testing.assert_allclose(kron, sep, rtol=1e-5, atol=1e-6)


def test_canvas_roi_kron_hardware_path_raises(rng):
    """kron is interpret-only: real Mosaic rejects its lane-merging
    weight reshape (r3 on-chip finding) — the hardware path must fail
    loudly at trace time, not with an opaque remote-compile 500."""
    import pytest
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [jnp.zeros((128 >> i, 128 >> i, 8), jnp.float32)
             for i in range(4)]
    rois = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    with pytest.raises(NotImplementedError, match="interpret-only"):
        multilevel_roi_align_canvas(
            fmaps, rois, [0.25, 0.125, 0.0625, 0.03125],
            out_size=7, pooling="kron")


def test_canvas_roi_group_sizes_match(rng):
    """group (ROIs per grid step) is a pure performance knob — results
    must be identical across group sizes, including when the ROI count
    is not a multiple of the group (padding path)."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [rng.standard_normal((128 >> i, 128 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = rng.uniform(0, 400, (11, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[:, :2], rois[:, 2:]),
                           np.maximum(rois[:, :2], rois[:, 2:]) + 2],
                          axis=-1)
    base = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True, group=8))
    for g in (2, 16):
        got = np.asarray(multilevel_roi_align_canvas(
            [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
            out_size=7, interpret=True, group=g))
        np.testing.assert_array_equal(got, base)


def test_canvas_roi_unroll_schedules_match(rng):
    """unroll (fori_loop body width) is a pure performance knob — every
    (group, unroll) schedule must produce identical results, including
    padding (R=11 not divisible by any group) and the batched path."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [rng.standard_normal((128 >> i, 128 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    rois = rng.uniform(0, 400, (11, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[:, :2], rois[:, 2:]),
                           np.maximum(rois[:, :2], rois[:, 2:]) + 2],
                          axis=-1)
    base = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True, group=8))
    for g, u in ((8, 2), (8, 4), (16, 4), (32, 8), (4, 4)):
        got = np.asarray(multilevel_roi_align_canvas(
            [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
            out_size=7, interpret=True, group=g, unroll=u))
        np.testing.assert_array_equal(got, base)
    # batched + unroll
    bfm = [np.stack([f, f + 1.0]) for f in fmaps]
    brois = np.stack([rois, rois[::-1]])
    want = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in bfm], jnp.asarray(brois), scales,
        out_size=7, interpret=True, group=8))
    got = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in bfm], jnp.asarray(brois), scales,
        out_size=7, interpret=True, group=16, unroll=8))
    np.testing.assert_array_equal(got, want)


def test_canvas_roi_indivisible_unroll_rejected(rng):
    """ADVICE r4: 0 < unroll < group with group % unroll != 0 would run
    group//unroll fori blocks and leave the remainder ROIs of every grid
    step unpooled (silent garbage rows) — must raise, not compute."""
    import pytest
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [jnp.zeros((128 >> i, 128 >> i, 8), jnp.float32)
             for i in range(4)]
    rois = jnp.asarray([[4.0, 4.0, 40.0, 40.0]])
    with pytest.raises(ValueError, match="divisible"):
        multilevel_roi_align_canvas(
            fmaps, rois, [0.25, 0.125, 0.0625, 0.03125],
            out_size=7, interpret=True, group=8, unroll=3)


def test_boxhead_wires_roi_schedule_knobs():
    """ADVICE r4: DetectorConfig.roi_group/roi_unroll must reach the
    BoxHead (they were silently dropped — configuring them was a
    no-op)."""
    import jax
    from ekaid_tpu.config import default_config
    from ekaid_tpu.models.detector.faster_rcnn import FasterRCNN
    cfg = default_config().detector
    cfg = cfg.replace(roi_group=16, roi_unroll=4)
    m = FasterRCNN(cfg, num_classes=3)
    bound = m.bind(m.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), train=False))
    assert bound.box_head.roi_group == 16
    assert bound.box_head.roi_unroll == 4


def test_canvas_roi_fuzz_vs_xla_oracle(rng):
    """Randomized sweep of the TPU-default canvas kernel vs the XLA
    gather oracle: 400 random ROIs over a 512-frame pyramid, checked on
    the non-level-bumped subset (the bump is the documented deviation,
    equivalence-tested separately against the patch-DMA kernel)."""
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_canvas
    fmaps = [rng.standard_normal((128 >> i, 128 >> i, 8)
                                 ).astype(np.float32) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    r = 400
    rois = rng.uniform(-20, 540, (r, 4)).astype(np.float32)
    rois = np.concatenate([np.minimum(rois[:, :2], rois[:, 2:]),
                           np.maximum(rois[:, :2], rois[:, 2:])
                           + rng.uniform(0.5, 3, (r, 2)).astype(np.float32)],
                          axis=1)
    long_side = np.maximum(rois[:, 2] - rois[:, 0],
                           rois[:, 3] - rois[:, 1])
    lv = np.asarray(assign_levels(jnp.asarray(rois))) - 2
    need = np.ceil(np.log2(np.maximum(long_side * 0.25 / 44.0,
                                      1e-6))).astype(int)
    unbumped = np.clip(np.maximum(lv, need), 0, 3) == lv
    assert unbumped.sum() > r // 2   # the sweep must mostly hit the hot path
    got = np.asarray(multilevel_roi_align_canvas(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7, interpret=True))
    want = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in fmaps], jnp.asarray(rois), scales,
        out_size=7))
    np.testing.assert_allclose(got[unbumped], want[unbumped],
                               rtol=1e-4, atol=1e-5)
