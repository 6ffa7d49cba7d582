"""Detectron2 R50-FPN checkpoint conversion: numerical parity.

Builds a fabricated Detectron2-layout state dict (the layout of the
reference's model_final_for_anatomy_gold.pth, train_anatomy.py:561-586),
runs a faithful torch replica of the Detectron2 forward (FrozenBN,
stride_in_1x1, caffe-R50) next to our flax model loaded through
`convert_detectron2_rcnn`, and asserts the feature pyramids, RPN head
outputs, and box-head outputs match numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ekaid_tpu.config import default_config
from ekaid_tpu.models.detector import FasterRCNN
from ekaid_tpu.models.detector.backbone import ResNetFPN
from ekaid_tpu.tools.torch_convert import (convert_detectron2_rcnn,
                                           detectron2_preprocess)
from ekaid_tpu.utils.dtypes import F32

DEPTHS = (3, 4, 6, 3)
STAGE_OUT = (256, 512, 1024, 2048)
NUM_CLASSES = 26


# ---------------------------------------------------------------- state


def _conv_w(rng, cout, cin, k):
    # modest magnitudes keep activations bounded through 50+ convs so
    # f32 parity tolerances stay meaningful
    return (rng.standard_normal((cout, cin, k, k)) * 0.05).astype(
        np.float32)


def _bn(rng, c, prefix, sd):
    sd[f"{prefix}.norm.weight"] = rng.uniform(0.5, 1.5, c).astype(
        np.float32)
    sd[f"{prefix}.norm.bias"] = (rng.standard_normal(c) * 0.1).astype(
        np.float32)
    sd[f"{prefix}.norm.running_mean"] = (
        rng.standard_normal(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.norm.running_var"] = rng.uniform(0.5, 1.5, c).astype(
        np.float32)


def make_d2_state(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    bu = "backbone.bottom_up"
    sd[f"{bu}.stem.conv1.weight"] = _conv_w(rng, 64, 3, 7)
    _bn(rng, 64, f"{bu}.stem.conv1", sd)
    cin = 64
    for s, (depth, cout) in enumerate(zip(DEPTHS, STAGE_OUT)):
        width = cout // 4
        for b in range(depth):
            p = f"{bu}.res{s + 2}.{b}"
            c_in = cin if b == 0 else cout
            sd[f"{p}.conv1.weight"] = _conv_w(rng, width, c_in, 1)
            _bn(rng, width, f"{p}.conv1", sd)
            sd[f"{p}.conv2.weight"] = _conv_w(rng, width, width, 3)
            _bn(rng, width, f"{p}.conv2", sd)
            sd[f"{p}.conv3.weight"] = _conv_w(rng, cout, width, 1)
            _bn(rng, cout, f"{p}.conv3", sd)
            if b == 0:
                sd[f"{p}.shortcut.weight"] = _conv_w(rng, cout, c_in, 1)
                _bn(rng, cout, f"{p}.shortcut", sd)
        cin = cout
    for lvl, c in zip((2, 3, 4, 5), STAGE_OUT):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = _conv_w(rng, 256, c, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = (
            rng.standard_normal(256) * 0.01).astype(np.float32)
        sd[f"backbone.fpn_output{lvl}.weight"] = _conv_w(rng, 256, 256, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = (
            rng.standard_normal(256) * 0.01).astype(np.float32)
    rp = "proposal_generator.rpn_head"
    sd[f"{rp}.conv.weight"] = _conv_w(rng, 256, 256, 3)
    sd[f"{rp}.conv.bias"] = np.zeros(256, np.float32)
    sd[f"{rp}.objectness_logits.weight"] = _conv_w(rng, 3, 256, 1)
    sd[f"{rp}.objectness_logits.bias"] = np.zeros(3, np.float32)
    sd[f"{rp}.anchor_deltas.weight"] = _conv_w(rng, 12, 256, 1)
    sd[f"{rp}.anchor_deltas.bias"] = np.zeros(12, np.float32)
    fdim = 256 * 7 * 7
    sd["roi_heads.box_head.fc1.weight"] = (
        rng.standard_normal((1024, fdim)) * 0.01).astype(np.float32)
    sd["roi_heads.box_head.fc1.bias"] = np.zeros(1024, np.float32)
    sd["roi_heads.box_head.fc2.weight"] = (
        rng.standard_normal((1024, 1024)) * 0.02).astype(np.float32)
    sd["roi_heads.box_head.fc2.bias"] = np.zeros(1024, np.float32)
    sd["roi_heads.box_predictor.cls_score.weight"] = (
        rng.standard_normal((NUM_CLASSES + 1, 1024)) * 0.02).astype(
            np.float32)
    sd["roi_heads.box_predictor.cls_score.bias"] = np.zeros(
        NUM_CLASSES + 1, np.float32)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = (
        rng.standard_normal((NUM_CLASSES * 4, 1024)) * 0.02).astype(
            np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros(
        NUM_CLASSES * 4, np.float32)
    return sd


# ------------------------------------------------------- torch replica


def tconv(x, sd, p, stride=1, pad=0):
    w = torch.from_numpy(sd[f"{p}.weight"])
    b = sd.get(f"{p}.bias")
    b = torch.from_numpy(b) if b is not None else None
    return TF.conv2d(x, w, b, stride=stride, padding=pad)


def tbn(x, sd, p):
    w = torch.from_numpy(sd[f"{p}.norm.weight"])
    b = torch.from_numpy(sd[f"{p}.norm.bias"])
    m = torch.from_numpy(sd[f"{p}.norm.running_mean"])
    v = torch.from_numpy(sd[f"{p}.norm.running_var"])
    scale = w / torch.sqrt(v + 1e-5)
    shift = b - m * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def torch_block(x, sd, p, stride):
    # stride_in_1x1=True: the downsampling stride sits on conv1
    if f"{p}.shortcut.weight" in sd:
        sc = tbn(tconv(x, sd, f"{p}.shortcut", stride=stride), sd,
                 f"{p}.shortcut")
    else:
        sc = x
    y = torch.relu(tbn(tconv(x, sd, f"{p}.conv1", stride=stride), sd,
                       f"{p}.conv1"))
    y = torch.relu(tbn(tconv(y, sd, f"{p}.conv2", pad=1), sd,
                       f"{p}.conv2"))
    y = tbn(tconv(y, sd, f"{p}.conv3"), sd, f"{p}.conv3")
    return torch.relu(y + sc)


def torch_fpn(sd, x_nchw):
    bu = "backbone.bottom_up"
    x = torch.relu(tbn(tconv(x_nchw, sd, f"{bu}.stem.conv1", stride=2,
                             pad=3), sd, f"{bu}.stem.conv1"))
    x = TF.max_pool2d(x, 3, stride=2, padding=1)
    cs = {}
    for s, depth in enumerate(DEPTHS):
        for b in range(depth):
            x = torch_block(x, sd, f"{bu}.res{s + 2}.{b}",
                            stride=(2 if (b == 0 and s > 0) else 1))
        cs[s + 2] = x
    lat = {l: tconv(cs[l], sd, f"backbone.fpn_lateral{l}")
           for l in (2, 3, 4, 5)}
    merged = {5: lat[5]}
    for l in (4, 3, 2):
        merged[l] = lat[l] + TF.interpolate(merged[l + 1],
                                            scale_factor=2,
                                            mode="nearest")
    out = {l: tconv(merged[l], sd, f"backbone.fpn_output{l}", pad=1)
           for l in (2, 3, 4, 5)}
    out[6] = TF.max_pool2d(out[5], 1, stride=2)
    return out


# ---------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def sd():
    return make_d2_state()


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(1)
    return rng.uniform(0.0, 1.0, (1, 64, 64, 3)).astype(np.float32)


def test_backbone_pyramid_parity(sd, image):
    x = detectron2_preprocess(image)
    params = convert_detectron2_rcnn(sd)
    model = ResNetFPN(out_channels=256, norm="frozen_bn",
                      stride_in_1x1=True, policy=F32)
    ours = model.apply({"params": params["backbone"]}, jnp.asarray(x))

    ref = torch_fpn(sd, torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2))))
    for lvl in (2, 3, 4, 5, 6):
        got = np.transpose(np.asarray(ours[f"p{lvl}"]), (0, 3, 1, 2))
        want = ref[lvl].numpy()
        # activations reach ~1e4 through 50+ compounding convs; judge
        # agreement on scale-relative error, not elementwise rtol
        scale = np.abs(want).max()
        err = np.abs(got - want).max() / scale
        assert err < 1e-4, f"p{lvl}: rel err {err:.2e} (scale {scale:.1e})"


def test_rpn_and_box_head_parity(sd, image):
    x = detectron2_preprocess(image)
    params = convert_detectron2_rcnn(sd)

    # RPN head over the real p2 map
    ref_pyr = torch_fpn(sd, torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2))))
    p2 = ref_pyr[2]
    rp = "proposal_generator.rpn_head"
    h = torch.relu(tconv(p2, sd, f"{rp}.conv", pad=1))
    ref_obj = tconv(h, sd, f"{rp}.objectness_logits")
    ref_dl = tconv(h, sd, f"{rp}.anchor_deltas")
    # detectron2 permute_to_N_HWA_K: channel (A,4) -> rows (H, W, A)
    n, a4, hh, ww = ref_dl.shape
    ref_obj_flat = ref_obj.permute(0, 2, 3, 1).reshape(n, -1).numpy()
    ref_dl_flat = (ref_dl.view(n, 3, 4, hh, ww)
                   .permute(0, 3, 4, 1, 2).reshape(n, -1, 4).numpy())

    from ekaid_tpu.models.detector.rpn import RPNHead
    rpn = RPNHead(policy=F32)
    p2_ours = jnp.asarray(np.transpose(p2.numpy(), (0, 2, 3, 1)))
    logits, deltas = rpn.apply({"params": params["rpn"]}, [p2_ours])
    np.testing.assert_allclose(np.asarray(logits[0]), ref_obj_flat,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(deltas[0]), ref_dl_flat,
                               rtol=2e-3, atol=2e-3)

    # box head FCs on a fabricated pooled tensor (torch flattens the
    # pooled ROI [C, 7, 7] C-major; ours is [7, 7, C] — the converter's
    # fc1 permutation must reconcile them)
    rng = np.random.default_rng(2)
    pooled_hwc = rng.standard_normal((4, 7, 7, 256)).astype(np.float32)
    pooled_chw = np.transpose(pooled_hwc, (0, 3, 1, 2))

    t = torch.from_numpy(pooled_chw.reshape(4, -1))
    w1 = torch.from_numpy(sd["roi_heads.box_head.fc1.weight"])
    b1 = torch.from_numpy(sd["roi_heads.box_head.fc1.bias"])
    w2 = torch.from_numpy(sd["roi_heads.box_head.fc2.weight"])
    b2 = torch.from_numpy(sd["roi_heads.box_head.fc2.bias"])
    feat_t = torch.relu(TF.linear(torch.relu(TF.linear(t, w1, b1)),
                                  w2, b2))
    ws = torch.from_numpy(sd["roi_heads.box_predictor.cls_score.weight"])
    bs = torch.from_numpy(sd["roi_heads.box_predictor.cls_score.bias"])
    wd = torch.from_numpy(sd["roi_heads.box_predictor.bbox_pred.weight"])
    bd = torch.from_numpy(sd["roi_heads.box_predictor.bbox_pred.bias"])
    ref_scores = TF.linear(feat_t, ws, bs).numpy()
    ref_deltas = TF.linear(feat_t, wd, bd).numpy()

    bh = params["box_head"]
    z = pooled_hwc.reshape(4, -1)
    f1 = np.maximum(z @ np.asarray(bh["fc1"]["kernel"])
                    + np.asarray(bh["fc1"]["bias"]), 0.0)
    f2 = np.maximum(f1 @ np.asarray(bh["fc2"]["kernel"])
                    + np.asarray(bh["fc2"]["bias"]), 0.0)
    np.testing.assert_allclose(f2, feat_t.numpy(), rtol=2e-3, atol=2e-3)
    got_scores = f2 @ np.asarray(bh["cls_score"]["kernel"]) + np.asarray(
        bh["cls_score"]["bias"])
    got_deltas = f2 @ np.asarray(bh["bbox_pred"]["kernel"]) + np.asarray(
        bh["bbox_pred"]["bias"])
    np.testing.assert_allclose(got_scores, ref_scores, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_deltas, ref_deltas, rtol=2e-3,
                               atol=2e-3)


def test_converted_tree_loads_and_detects(sd, image):
    """Converted params must be structurally identical to a fresh init
    of the frozen_bn/stride_in_1x1 model, and drive `detect`."""
    cfg = default_config().detector.replace(
        image_size=64, pre_nms_topk=64, post_nms_topk=32)
    model = FasterRCNN(cfg, num_classes=NUM_CLASSES, norm="frozen_bn",
                       stride_in_1x1=True, policy=F32)
    x = jnp.asarray(detectron2_preprocess(image))
    init = model.init(jax.random.PRNGKey(0), x)

    conv = {"params": convert_detectron2_rcnn(sd)}
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    conv_shapes = jax.tree.map(lambda a: np.asarray(a).shape, conv)
    assert jax.tree_util.tree_structure(init_shapes) == \
        jax.tree_util.tree_structure(conv_shapes)
    assert init_shapes == conv_shapes

    out = model.apply(jax.tree.map(jnp.asarray, conv), x,
                      method="detect")
    assert out["boxes"].shape == (1, 26, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()
