"""Faster R-CNN detector tests (small image sizes, CPU)."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.models.detector import FasterRCNN
from ekaid_tpu.models.detector.anchors import (decode_boxes, encode_boxes,
                                               pyramid_anchors)
from ekaid_tpu.utils.dtypes import F32

IMG = 128
K = 5


@pytest.fixture(scope="module")
def setup():
    cfg = default_config().detector.replace(
        image_size=IMG, pre_nms_topk=100, post_nms_topk=50,
        roi_feat_dim=64, fpn_channels=32)
    model = FasterRCNN(cfg, num_classes=K, policy=F32)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, IMG, IMG, 3)),
        jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images)
    return cfg, model, images, params


def test_encode_decode_roundtrip(rng):
    src = jnp.asarray([[10.0, 20.0, 110.0, 90.0],
                       [5.0, 5.0, 50.0, 80.0]])
    tgt = jnp.asarray([[15.0, 25.0, 100.0, 95.0],
                       [0.0, 10.0, 60.0, 70.0]])
    for w in [(1, 1, 1, 1), (10, 10, 5, 5)]:
        deltas = encode_boxes(src, tgt, weights=w)
        back = decode_boxes(deltas, src, weights=w)
        np.testing.assert_allclose(np.asarray(back), np.asarray(tgt),
                                   rtol=1e-4, atol=1e-3)


def test_pyramid_anchors_shapes():
    anchors = pyramid_anchors(IMG)
    # strides 4..64 -> 32,16,8,4,2 cells per side, 3 anchors each
    sizes = [(IMG // s) ** 2 * 3 for s in (4, 8, 16, 32, 64)]
    assert [a.shape[0] for a in anchors] == sizes
    # centered geometry: anchor 1 (ratio 1.0) at cell (0,0) of p2 is a
    # 32x32 box centered at 0
    a = anchors[0][1]
    np.testing.assert_allclose(a, [-16, -16, 16, 16], atol=1e-5)


def test_forward_shapes(setup):
    cfg, model, images, params = setup
    out = model.apply(params, images)
    P = cfg.post_nms_topk
    assert out["proposals"].shape == (2, P, 4)
    assert out["proposal_valid"].shape == (2, P)
    assert out["roi_features"].shape == (2, P, cfg.roi_feat_dim)
    assert out["cls_scores"].shape == (2, P, K + 1)
    assert out["box_deltas"].shape == (2, P, K * 4)
    # proposals are within the image
    pr = np.asarray(out["proposals"])
    assert pr.min() >= 0 and pr.max() <= IMG


def test_extract_contract(setup):
    cfg, model, images, params = setup
    out = model.apply(params, images, method="extract")
    assert out["features"].shape == (2, K, cfg.roi_feat_dim)
    assert out["boxes"].shape == (2, K, 4)
    assert out["classes"].shape == (2, K)
    found = np.asarray(out["found"])
    feats = np.asarray(out["features"])
    boxes = np.asarray(out["boxes"])
    classes = np.asarray(out["classes"])
    for b in range(2):
        for k in range(K):
            if found[b, k]:
                assert classes[b, k] == k
            else:
                # missing classes are zero-filled (ana_bbox_generator
                # :592-597 parity)
                assert classes[b, k] == K
                assert (feats[b, k] == 0).all()
                assert (boxes[b, k] == 0).all()


def test_extract_topk_budget(setup):
    """extract_topk=N slices the score-sorted proposals: at
    N == post_nms_topk the outputs are identical to the default path
    (proposals are already sorted — the slice is the whole set); at a
    smaller N the contract holds and every found class's selection is a
    member of the full run's top-N proposal rows."""
    cfg, model, images, params = setup
    out_full = model.apply(params, images, method="extract")
    model_eq = type(model)(cfg.replace(extract_topk=cfg.post_nms_topk),
                           num_classes=K, policy=F32)
    out_eq = model_eq.apply(params, images, method="extract")
    for key in ("features", "boxes", "scores", "classes", "found"):
        np.testing.assert_array_equal(np.asarray(out_eq[key]),
                                      np.asarray(out_full[key]),
                                      err_msg=key)
    # extract_topk=N must be bit-identical to post_nms_topk=N: the
    # proposals are score-sorted, so the top-N slice IS the post=N
    # survivor list, and `pre` follows the effective budget
    model_small = type(model)(cfg.replace(extract_topk=10),
                              num_classes=K, policy=F32)
    out_small = model_small.apply(params, images, method="extract")
    assert out_small["features"].shape == out_full["features"].shape
    model_post10 = type(model)(cfg.replace(post_nms_topk=10),
                               num_classes=K, policy=F32)
    out_post10 = model_post10.apply(params, images, method="extract")
    for key in ("features", "boxes", "scores", "classes", "found"):
        np.testing.assert_array_equal(np.asarray(out_small[key]),
                                      np.asarray(out_post10[key]),
                                      err_msg=key)


def test_losses_finite_and_differentiable(setup):
    cfg, model, images, params = setup
    g = 3
    gt_boxes = jnp.asarray([[[10, 10, 60, 60], [30, 40, 90, 100],
                             [0, 0, 0, 0]],
                            [[5, 5, 40, 40], [0, 0, 0, 0], [0, 0, 0, 0]]],
                           jnp.float32)
    gt_classes = jnp.asarray([[0, 2, 0], [4, 0, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True, False],
                            [True, False, False]])

    def loss_fn(p):
        losses = model.apply(p, images, gt_boxes, gt_classes, gt_valid,
                             jax.random.PRNGKey(1), method="losses")
        return losses["total"], losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gsq = sum(float(jnp.sum(g * g)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsq) and gsq > 0


def test_detector_trainer_cpu_smoke():
    """DetectorTrainer end-to-end on CPU: a few steps + val loss + AP."""
    from ekaid_tpu.config import default_config
    from ekaid_tpu.train.train_detector import (DetectorTrainer,
                                                synthetic_blob_dataset)
    cfg = default_config()
    cfg = cfg.replace(detector=cfg.detector.replace(
        image_size=64, batch_size=4, fpn_channels=16, roi_feat_dim=32,
        pre_nms_topk=50, post_nms_topk=30))
    tr = DetectorTrainer(cfg, num_classes=3, total_steps=4, lr=1e-3)
    arrays = synthetic_blob_dataset(8, 64, 3, seed=1)
    last = tr.fit(arrays, steps=4, log_every=2)
    assert np.isfinite(last["total"])
    vl = tr.validation_loss(arrays)
    assert np.isfinite(vl["val_total"])
    scores = tr.evaluate(arrays)
    assert "AP50" in scores and "AR" in scores


def test_detector_trainer_finetune_roundtrip(tmp_path):
    """--init_ckpt semantics: params saved by one trainer initialize
    another (cfg.MODEL.WEIGHTS fine-tune parity), incl. the frozen_bn
    variant used for converted reference checkpoints."""
    import orbax.checkpoint as ocp

    from ekaid_tpu.config import default_config
    from ekaid_tpu.train.train_detector import DetectorTrainer
    cfg = default_config()
    cfg = cfg.replace(detector=cfg.detector.replace(
        image_size=64, batch_size=2, fpn_channels=16, roi_feat_dim=32,
        pre_nms_topk=50, post_nms_topk=30))
    tr = DetectorTrainer(cfg, num_classes=3, total_steps=2,
                         norm="frozen_bn", stride_in_1x1=True)
    out = tmp_path / "det_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(out), tr.params, force=True)
    ckptr.wait_until_finished()

    tr2 = DetectorTrainer(cfg, num_classes=3, total_steps=2,
                          norm="frozen_bn", stride_in_1x1=True)
    restored = ckptr.restore(str(out), tr2.params)
    chex.assert_trees_all_equal(restored, tr.params)


def test_rpn_nms_is_level_aware():
    """Detectron2's find_top_rpn_proposals passes level ids to
    batched_nms: identical boxes from DIFFERENT pyramid levels must
    both survive; within a level the duplicate is suppressed."""
    import jax.numpy as jnp
    from ekaid_tpu.models.detector.rpn import generate_proposals

    # two levels, one anchor each, identical decoded box (zero deltas)
    anchors = [jnp.asarray([[10.0, 10.0, 50.0, 50.0]]),
               jnp.asarray([[10.0, 10.0, 50.0, 50.0]])]
    logits = [jnp.asarray([[2.0]]), jnp.asarray([[1.0]])]
    deltas = [jnp.zeros((1, 1, 4)), jnp.zeros((1, 1, 4))]
    boxes, scores, valid = generate_proposals(
        logits, deltas, anchors, image_size=64,
        pre_nms_topk=1, post_nms_topk=4, nms_thresh=0.5)
    assert int(valid.sum()) == 2        # joint NMS would keep only 1


def test_rpn_approx_topk_matches_exact_on_cpu():
    """detector.rpn_topk='approx' (lax.approx_max_k) must produce the
    same proposal set as the exact sort when k covers the whole score
    array, and a high-recall superset-ish selection otherwise. On CPU
    approx_max_k lowers to an exact reduction, so the sets agree —
    this pins the wiring; the recall deviation is an on-chip property
    (DOCUMENTED DEVIATION, rpn.py)."""
    import jax
    import jax.numpy as jnp
    from ekaid_tpu.models.detector.rpn import generate_proposals

    rng = np.random.default_rng(0)
    n = 512
    anchors = [jnp.asarray(np.stack([
        rng.uniform(0, 30, n), rng.uniform(0, 30, n),
        rng.uniform(34, 64, n), rng.uniform(34, 64, n)], 1)
        .astype(np.float32))]
    logits = [jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))]
    deltas = [jnp.asarray(0.1 * rng.standard_normal((1, n, 4))
                          .astype(np.float32))]
    outs = {}
    for impl in ("exact", "approx"):
        boxes, scores, valid = generate_proposals(
            logits, deltas, anchors, image_size=64,
            pre_nms_topk=64, post_nms_topk=16, nms_thresh=0.7,
            topk_impl=impl)
        outs[impl] = (np.asarray(boxes), np.asarray(valid))
    assert outs["exact"][1].sum() == outs["approx"][1].sum()
    np.testing.assert_allclose(outs["exact"][0], outs["approx"][0],
                               rtol=1e-5)


def test_s2d_stem_is_exact(rng):
    """s2d_stem is a pure perf rewrite: the SAME [7,7,3,64] stem kernel
    must produce the 7x7/s2 conv's output through the 4x4/s1
    space-to-depth formulation, including image borders (asymmetric
    (2,1) padding vs symmetric pad-3). Tight tolerance on the stem op
    itself (only summation order differs); looser through the full
    50-layer pyramid where the reordering noise compounds."""
    from flax import linen as nn
    from ekaid_tpu.models.detector.backbone import (ResNetFPN,
                                                    SpaceToDepthStem)

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    conv = nn.Conv(16, (7, 7), strides=2, padding=3, use_bias=False,
                   name="stem_conv")
    cp = conv.init(jax.random.PRNGKey(0), x)
    want = conv.apply(cp, x)
    got = SpaceToDepthStem(16, name="stem_conv").apply(cp, x)
    assert got.shape == want.shape == (2, 32, 32, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    base = ResNetFPN(out_channels=32, norm="gn", s2d_stem=False)
    s2d = ResNetFPN(out_channels=32, norm="gn", s2d_stem=True)
    params = base.init(jax.random.PRNGKey(0), x)
    # identical param trees (checkpoint compatibility)
    chex.assert_trees_all_equal_structs(
        params, s2d.init(jax.random.PRNGKey(0), x))
    wantp = base.apply(params, x)
    gotp = s2d.apply(params, x)
    for k in wantp:
        np.testing.assert_allclose(np.asarray(gotp[k]),
                                   np.asarray(wantp[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_rpn_fused_preds_bit_identical():
    """rpn_fused_preds runs objectness+deltas as ONE 15-channel conv
    over the shared hidden map (rpn.py::RPNHead). Each conv output
    channel is an independent dot product, so the fused path must be
    BIT-identical with the same params — and the param tree must not
    change (checkpoint/converter compatibility)."""
    from ekaid_tpu.models.detector.rpn import RPNHead
    import chex
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.standard_normal((2, s, s, 32), np.float32))
             for s in (16, 8, 4)]
    base = RPNHead(channels=32)
    fused = RPNHead(channels=32, fused_preds=True)
    params = base.init(jax.random.PRNGKey(0), feats)
    chex.assert_trees_all_equal_structs(
        params, fused.init(jax.random.PRNGKey(0), feats))
    lg0, bx0 = base.apply(params, feats)
    lg1, bx1 = fused.apply(params, feats)
    for a, b in zip(lg0, lg1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(bx0, bx1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
