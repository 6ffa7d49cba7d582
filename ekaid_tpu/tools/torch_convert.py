"""Convert reference torch checkpoints into ekaid_tpu param trees.

Covers the model-side checkpoint the reference ships/saves
(train_mimic.py:283-287: {change_detector_state, speaker_state,
model_cfg}) so users migrating from the reference can load trained
weights without retraining. Torch runs CPU-only here (weights load with
map_location='cpu', utils/utils.py:11-15 parity).

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
    a = p.parse_args(argv)
    params = convert_checkpoint(a.torch_ckpt)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(a.out_dir), params, force=True)
    ckptr.wait_until_finished()
    print(f"converted → {a.out_dir}")


if __name__ == "__main__":
    main()
