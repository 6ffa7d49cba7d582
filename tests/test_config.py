"""Config-system behavior: strict keys, literal-eval coercion, dotted
CLI overrides (reference configs/config.py:177-284 parity on frozen
dataclasses)."""

import dataclasses

import pytest

from ekaid_tpu.config import (default_config, load_config, merge_from_list,
                              merge_overrides)


def test_defaults_reproduce_reference_yaml():
    """Spot-check the shipped reference defaults
    (dynamic_change_pos_mimic.yaml)."""
    cfg = default_config()
    assert cfg.change_detector.att_dim == 1024
    assert cfg.speaker.seq_length == 90
    assert cfg.data.num_nodes == 52
    assert cfg.train.optim.lr == pytest.approx(1e-4)
    assert cfg.train.att_reg_weight == pytest.approx(2.5e-3)


def test_frozen():
    cfg = default_config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.train.max_iter = 1


def test_unknown_key_raises():
    cfg = default_config()
    with pytest.raises(KeyError, match="Non-existent"):
        merge_overrides(cfg, {"train": {"no_such_knob": 1}})
    with pytest.raises(KeyError, match="Non-existent"):
        merge_overrides(cfg, {"no_such_section": {}})


def test_merge_from_list_coercion():
    """CLI values arrive as strings; literal_eval + type coercion must
    land them at the dataclass field types (configs/config.py:226-284
    parity)."""
    cfg = default_config()
    cfg = merge_from_list(cfg, [
        "train.max_iter", "123",                # str -> int
        "train.optim.lr", "3e-4",               # str -> float
        "train.accum_steps", "4",
        "train.length_buckets", "[24, 48]",     # list literal -> tuple
        "speaker.remat", "dots",                # plain string stays
        "detector.stride_in_1x1", "1",          # int -> bool
        "speaker.train_hoist", "true",          # lowercase bool spelling
        "speaker.fused_core", "False",          # literal_eval bool
    ])
    assert cfg.train.max_iter == 123
    assert cfg.train.optim.lr == pytest.approx(3e-4)
    assert cfg.train.accum_steps == 4
    assert cfg.train.length_buckets == (24, 48)
    assert cfg.speaker.remat == "dots"
    assert cfg.detector.stride_in_1x1 is True
    assert cfg.speaker.train_hoist is True
    assert cfg.speaker.fused_core is False


def test_resolve_decode_kernel():
    """'auto' resolves to xla off-TPU (this env), explicit values pass
    through, and an unresolved 'auto' takes the decoder's XLA branch
    (it is not a 'pallas*' string)."""
    from ekaid_tpu.utils.platform import resolve_decode_kernel
    assert resolve_decode_kernel("xla") == "xla"
    assert resolve_decode_kernel("pallas") == "pallas"
    assert resolve_decode_kernel("auto") == "xla"
    assert not "auto".startswith("pallas")


def test_merge_from_list_rejects_odd_pairs():
    with pytest.raises(AssertionError):
        merge_from_list(default_config(), ["train.max_iter"])


def test_type_mismatch_raises():
    with pytest.raises(ValueError, match="Type mismatch"):
        merge_overrides(default_config(),
                        {"train": {"max_iter": "not_a_number"}})


def test_yaml_overlay(tmp_path):
    y = tmp_path / "o.yaml"
    y.write_text("train:\n  max_iter: 7\nspeaker:\n  rnn_size: 64\n")
    cfg = load_config(str(y))
    assert cfg.train.max_iter == 7
    assert cfg.speaker.rnn_size == 64
    # untouched keys keep defaults
    assert cfg.data.num_nodes == 52


def test_round_trip_dict():
    cfg = default_config()
    d = cfg.to_dict()
    cfg2 = merge_overrides(default_config(), d)
    assert cfg2 == cfg
