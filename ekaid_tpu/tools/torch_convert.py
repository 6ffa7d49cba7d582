"""Convert reference torch checkpoints into ekaid_tpu param trees.

Covers (a) the model-side checkpoint the reference ships/saves
(train_mimic.py:283-287: {change_detector_state, speaker_state,
model_cfg}) and (b) the Detectron2 R50-FPN detector checkpoints
(model_final_for_anatomy_gold.pth / model_final_for_vindr.pth,
train_anatomy.py:561-586) so users migrating from the reference can load
trained weights without retraining. Torch runs CPU-only here (weights
load with map_location='cpu', utils/utils.py:11-15 parity).

Mapping notes (kernel layouts):
  * torch Linear weight [out, in] → our kernel [in, out] (transpose);
  * weight_norm Linears ship weight_g (scalar) + weight_v → WNDense
    {g, v.T};
  * torch LSTMCell weight_ih/hh [4H, in] b_ih+b_hh → fused {w_ih.T,
    w_hh.T, b = b_ih + b_hh} with the same (i, f, g, o) gate order;
  * torch GRU weight_ih_l0/hh_l0 [3H, in] → {w_ih.T, w_hh.T, b_ih,
    b_hh} with the same (r, z, n) gate order;
  * Embeddings copy as-is.

GAT direction-0 parameters (unused in the reference's executed path —
see models/gat.py) are mapped too, so round-trips are exact.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _linear(sd, prefix: str) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _wn_linear(sd, prefix: str) -> Dict:
    out = {"g": np.asarray(sd[f"{prefix}.weight_g"]).reshape(()),
           "v": _t(sd[f"{prefix}.weight_v"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _fcnet(sd, prefix: str, n_layers: int = 1) -> Dict:
    """FCNet: sequence of weight-norm Linears inside .main (fc.py:39).
    Dropout layers occupy Sequential slots, so linear indices are the
    even slots when dropout>0 — we detect by key presence."""
    out = {}
    li = 0
    for slot in range(8):
        key = f"{prefix}.main.{slot}.weight_v"
        if key in sd:
            out[f"WNDense_{li}"] = _wn_linear(sd, f"{prefix}.main.{slot}")
            li += 1
    assert li >= 1, f"no weight-norm linears under {prefix}"
    return out


def _lstm_cell(sd, prefix: str) -> Dict:
    return {
        "w_ih": _t(sd[f"{prefix}.weight_ih"]),
        "w_hh": _t(sd[f"{prefix}.weight_hh"]),
        "b": (np.asarray(sd[f"{prefix}.bias_ih"])
              + np.asarray(sd[f"{prefix}.bias_hh"])),
    }


def _gru(sd, prefix: str) -> Dict:
    return {
        "w_ih": _t(sd[f"{prefix}.weight_ih_l0"]),
        "w_hh": _t(sd[f"{prefix}.weight_hh_l0"]),
        "b_ih": np.asarray(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh": np.asarray(sd[f"{prefix}.bias_hh_l0"]),
    }


def _gat(sd, prefix: str) -> Dict:
    out = {
        "self_weights": _fcnet(sd, f"{prefix}.self_weights"),
        "bias": _fcnet(sd, f"{prefix}.bias"),
    }
    for d in (0, 1):
        net = {}
        np_prefix = f"{prefix}.neighbor_net.{d}"
        net["query"] = _fcnet(sd, f"{np_prefix}.query")
        net["key"] = _fcnet(sd, f"{np_prefix}.key")
        net["linear_out_2"] = _linear(sd, f"{np_prefix}.linear_out_2")
        if f"{np_prefix}.pair_pos_fc1.main.1.weight_v" in sd or \
                f"{np_prefix}.pair_pos_fc1.main.0.weight_v" in sd:
            net["pair_pos_fc1"] = _fcnet(sd, f"{np_prefix}.pair_pos_fc1")
        out[f"neighbor_net_{d}"] = net
    return out


def _relation_encoder(sd, prefix: str) -> Dict:
    kind = ("implicit_relation"
            if f"{prefix}.implicit_relation.self_weights.main.1.weight_v"
            in sd else "explicit_relation")
    return {"gat": _gat(sd, f"{prefix}.{kind}")}


def convert_change_detector(sd) -> Dict:
    """change_detector_state → ChangeDetector param subtree."""
    out = {
        "img": _linear(sd, "img"),
        "context1": _linear(sd, "context1"),
        "context2": _linear(sd, "context2"),
        "gate1": _linear(sd, "gate1"),
        "gate2": _linear(sd, "gate2"),
        "embed": _linear(sd, "embed.0"),
        "att": _linear(sd, "att"),
        "fc1": _linear(sd, "fc1"),
        "question": {
            "WordEmbedding_0": {
                "emb": np.asarray(sd["w_emb.emb.weight"]),
                "emb_fixed": np.asarray(sd["w_emb.emb_.weight"]),
            },
            "GRU_0": _gru(sd, "q_emb.rnn"),
            "QuestionSelfAttention_0": {
                "FCNet_0": _fcnet(sd, "q_att.W1_self_att_q"),
                "FCNet_1": _fcnet(sd, "q_att.W2_self_att_q"),
            },
        },
    }
    for name in ("semantic_relation", "spatial_relation", "imp_relation"):
        if any(k.startswith(name + ".") for k in sd):
            out[name] = _relation_encoder(sd, name)
    return out


def convert_speaker(sd) -> Dict:
    """speaker_state → DynamicSpeaker param subtree."""
    return {
        "word_emb": np.asarray(sd["embed.0.weight"]),
        "embed": _linear(sd, "core.embed.0"),
        "logit": _linear(sd, "logit"),
        "core": {
            "module_att_lstm": _lstm_cell(sd, "core.module_att_lstm"),
            "lang_lstm": _lstm_cell(sd, "core.lang_lstm"),
            "weight_fc": _linear(sd, "core.weight_fc.0"),
            "pos1": _linear(sd, "core.pos1.0"),
            "weight_pos": _linear(sd, "core.weight_pos"),
            "pos2": _linear(sd, "core.pos2"),
            "gate1x": _linear(sd, "core.gate1x.0"),
            "gate2x": _linear(sd, "core.gate2x"),
        },
    }


# ---------------------------------------------------------------------
# Detectron2 R50-FPN detector checkpoints
# (reference `model_final_for_anatomy_gold.pth` /
#  `model_final_for_vindr.pth`, built from the zoo config at
#  train_anatomy.py:561-586; key layout is Detectron2 GeneralizedRCNN).
# ---------------------------------------------------------------------

_D2_BN_EPS = 1e-5          # detectron2 FrozenBatchNorm2d eps
_D2_DEPTHS = (3, 4, 6, 3)  # R50


def _conv(sd, prefix: str) -> Dict:
    """torch conv [out, in, kh, kw] → flax HWIO [kh, kw, in, out]."""
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]),
                                  (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _d2_frozen_bn(sd, prefix: str) -> Dict:
    """FrozenBatchNorm2d (weight/bias/running_mean/running_var) →
    FrozenAffine {scale, bias}: y = x·w/√(var+eps) + (b − mean·w/√(var+eps))."""
    w = np.asarray(sd[f"{prefix}.norm.weight"], np.float64)
    b = np.asarray(sd[f"{prefix}.norm.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.norm.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.norm.running_var"], np.float64)
    scale = w / np.sqrt(var + _D2_BN_EPS)
    return {"scale": scale.astype(np.float32),
            "bias": (b - mean * scale).astype(np.float32)}


def _d2_bottleneck(sd, prefix: str) -> Dict:
    out = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
        out[f"norm{i}"] = _d2_frozen_bn(sd, f"{prefix}.conv{i}")
    if f"{prefix}.shortcut.weight" in sd:
        out["conv_sc"] = _conv(sd, f"{prefix}.shortcut")
        out["norm_sc"] = _d2_frozen_bn(sd, f"{prefix}.shortcut")
    return out


def _fc_after_pool(sd, prefix: str, pool: int = 7,
                   channels: int = 256) -> Dict:
    """box_head.fc1: torch flattens pooled [C, H, W] C-major; our BoxHead
    flattens [H, W, C] — permute the input axis accordingly."""
    w = np.asarray(sd[f"{prefix}.weight"])            # [out, C*H*W]
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, pool, pool)
    w = np.transpose(w, (2, 3, 1, 0)).reshape(pool * pool * channels,
                                              out_dim)
    return {"kernel": np.ascontiguousarray(w),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_detectron2_rcnn(sd, pool: int = 7, channels: int = 256
                            ) -> Dict:
    """Detectron2 GeneralizedRCNN state dict → FasterRCNN param tree.

    Load into `FasterRCNN(cfg, num_classes=K, norm='frozen_bn',
    stride_in_1x1=True)` — Detectron2's caffe-R50 strides the 1×1 conv
    (RESNETS.STRIDE_IN_1X1 default) and carries frozen BN affines.
    The extraction CLI takes `--norm frozen_bn --stride_in_1x1` (or
    set `detector.norm`/`detector.stride_in_1x1` in the config) so the
    built model matches; GN would silently mis-apply these weights.
    Inputs must be preprocessed with `detectron2_preprocess` (BGR,
    0-255, mean-subtracted) for numerical parity.
    """
    bu = "backbone.bottom_up"
    resnet = {"stem_conv": _conv(sd, f"{bu}.stem.conv1"),
              "stem_norm": _d2_frozen_bn(sd, f"{bu}.stem.conv1")}
    for stage, depth in enumerate(_D2_DEPTHS):
        for block in range(depth):
            resnet[f"c{stage + 2}_b{block}"] = _d2_bottleneck(
                sd, f"{bu}.res{stage + 2}.{block}")
    backbone = {"resnet": resnet}
    for lvl in (2, 3, 4, 5):
        backbone[f"lateral{lvl}"] = _conv(sd, f"backbone.fpn_lateral{lvl}")
        backbone[f"out{lvl}"] = _conv(sd, f"backbone.fpn_output{lvl}")
    rpn = {"conv": _conv(sd, "proposal_generator.rpn_head.conv"),
           "objectness": _conv(
               sd, "proposal_generator.rpn_head.objectness_logits"),
           "deltas": _conv(
               sd, "proposal_generator.rpn_head.anchor_deltas")}
    box_head = {
        "fc1": _fc_after_pool(sd, "roi_heads.box_head.fc1", pool,
                              channels),
        "fc2": _linear(sd, "roi_heads.box_head.fc2"),
        "cls_score": _linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    return {"backbone": backbone, "rpn": rpn, "box_head": box_head}


def detectron2_preprocess(images_rgb01: np.ndarray,
                          pixel_mean=(103.530, 116.280, 123.675),
                          pixel_std=(1.0, 1.0, 1.0)) -> np.ndarray:
    """[B, H, W, 3] RGB in [0, 1] → caffe-BGR normalized, matching the
    reference predictor's input format (DefaultPredictor input_format
    'BGR' with the zoo R50-FPN pixel_mean/std buffers). Defaults are the
    checkpoint's own `pixel_mean`/`pixel_std` values when present."""
    bgr = images_rgb01[..., ::-1] * 255.0
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    return ((bgr - mean) / std).astype(np.float32)


def convert_detector_checkpoint(torch_ckpt_path: str) -> Dict:
    """Reference detector .pth → {'params': {...}} + preprocessing info.

    Handles both raw state dicts and DetectionCheckpointer's
    {'model': ...} wrapper.
    """
    import torch
    ck = torch.load(torch_ckpt_path, map_location="cpu",
                    weights_only=False)
    sd = ck.get("model", ck)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    params = convert_detectron2_rcnn(sd)
    meta = {}
    if "pixel_mean" in sd:
        meta["pixel_mean"] = np.asarray(sd["pixel_mean"]).reshape(-1)
        meta["pixel_std"] = np.asarray(sd["pixel_std"]).reshape(-1)
    return {"params": params, "meta": meta}


def convert_checkpoint(torch_ckpt_path: str) -> Dict:
    """Reference .pt checkpoint → {'params': {...}} pytree."""
    import torch
    ck = torch.load(torch_ckpt_path, map_location="cpu",
                    weights_only=False)
    cd = {k: v.numpy() for k, v in ck["change_detector_state"].items()}
    sp = {k: v.numpy() for k, v in ck["speaker_state"].items()}
    return {"params": {
        "change_detector": convert_change_detector(cd),
        "speaker": convert_speaker(sp),
    }}


def main(argv=None):
    import argparse
    import orbax.checkpoint as ocp
    import os
    p = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to ekaid_tpu")
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--kind", choices=("model", "detector"),
                   default="model",
                   help="'model' = ChangeDetector+speaker .pt; "
                        "'detector' = Detectron2 R50-FPN .pth")
    a = p.parse_args(argv)
    if a.kind == "detector":
        params = {"params": convert_detector_checkpoint(a.torch_ckpt)
                  ["params"]}
    else:
        params = convert_checkpoint(a.torch_ckpt)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(a.out_dir), params, force=True)
    ckptr.wait_until_finished()
    print(f"converted → {a.out_dir}")


if __name__ == "__main__":
    main()
