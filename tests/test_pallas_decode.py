"""Monolithic Pallas decode kernel vs the XLA while_loop path.

Interpret-mode equivalence at f32 (CPU): greedy tokens must match
exactly; logprobs/module weights to f32 summation-order tolerance.
The on-chip (bf16, compiled) A/B runs in scripts/run_tpu_queue.sh /
bench.py --variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.data.synthetic import synthetic_batch
from ekaid_tpu.models.ekaid import EkaidModel
from ekaid_tpu.utils.dtypes import F32

NTOKEN = 147


def tiny_cfg():
    cfg = default_config()
    return cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=64, att_head=4, dim=16, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=64, rnn_size=32, embed_input_dim=192, embed_dim=64,
            word_embed_size=24, seq_length=12),
        data=cfg.data.replace(num_nodes=8, feature_dim=48, adj_pad=20),
        question=cfg.question.replace(hidden_dim=64))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 4, seed=3))
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    return cfg, batch, params


def _decode(cfg, params, batch, kernel: bool):
    if kernel:
        cfg = cfg.replace(speaker=cfg.speaker.replace(
            decode_kernel="pallas_interpret"))
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    return model.apply(params, batch, method="decode", sample_max=True)


def _assert_match(ref, out):
    np.testing.assert_array_equal(np.asarray(ref["seq"]),
                                  np.asarray(out["seq"]))
    np.testing.assert_allclose(np.asarray(ref["logprobs"]),
                               np.asarray(out["logprobs"]),
                               atol=5e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref["module_weights"]),
                               np.asarray(out["module_weights"]),
                               atol=5e-6)


def test_kernel_matches_xla(setup):
    cfg, batch, params = setup
    _assert_match(_decode(cfg, params, batch, False),
                  _decode(cfg, params, batch, True))


def test_kernel_matches_xla_early_exit(setup):
    """Bias the logit head hard toward token 0 so every row emits EOS
    at step 1 (step 0 is NULL-suppressed): the kernel's in-kernel
    while_loop exit must leave the identical zero tail."""
    cfg, batch, params = setup
    p = jax.tree.map(lambda x: x, params)    # shallow copy of the tree
    bias = np.asarray(p["params"]["speaker"]["logit"]["bias"]).copy()
    bias[0] += 100.0
    p = jax.tree_util.tree_map(lambda x: x, p)
    p["params"]["speaker"]["logit"]["bias"] = jnp.asarray(bias)
    ref = _decode(cfg, p, batch, False)
    out = _decode(cfg, p, batch, True)
    seq = np.asarray(ref["seq"])
    assert (seq[:, 1:] == 0).all() and (seq[:, 0] > 0).all()
    _assert_match(ref, out)
    # post-EOS module-weight rows are zeroed in both paths
    assert np.asarray(out["module_weights"])[:, 1:].sum() == 0.0


def test_kernel_matches_xla_decoding_constraint(setup):
    cfg, batch, params = setup
    cfg = cfg.replace(speaker=cfg.speaker.replace(decoding_constraint=1))
    ref = _decode(cfg, params, batch, False)
    out = _decode(cfg, params, batch, True)
    seq = np.asarray(ref["seq"])
    live = seq[:, :-1] > 0
    assert not ((seq[:, 1:] == seq[:, :-1]) & live).any()  # no repeats
    _assert_match(ref, out)


def test_kernel_sharded_matches_xla(setup):
    """VERDICT r4 #4: the kernel under `jax.shard_map` over the 'data'
    mesh axis (models/pallas_decode.py mesh= path) must be token-exact
    vs the XLA loop — the decode is batch-parallel, each device shard
    decodes independently with no cross-chip communication. Runs in
    interpret mode on the conftest's 8 virtual CPU devices, both eager
    and through jit with the batch sharded over 'data' (the real eval
    path shape)."""
    cfg, batch, params = setup
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices (conftest forces 8 CPU)")
    from ekaid_tpu.parallel.mesh import make_mesh, shard_batch
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    ref = _decode(cfg, params, batch, False)
    cfg_k = cfg.replace(speaker=cfg.speaker.replace(
        decode_kernel="pallas_interpret"))
    model = EkaidModel(cfg_k, ntoken=NTOKEN, policy=F32, decode_mesh=mesh)
    out = model.apply(params, batch, method="decode", sample_max=True)
    _assert_match(ref, out)
    jit_dec = jax.jit(
        lambda p, b: model.apply(p, b, method="decode", sample_max=True))
    out_j = jit_dec(params, shard_batch(mesh, batch))
    _assert_match(ref, out_j)


def test_kernel_sharded_rejects_indivisible_batch(setup):
    """B=3 over a 4-way data axis must fail loudly (the shard_map specs
    would otherwise mis-shard silently)."""
    cfg, batch, params = setup
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    from ekaid_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    cfg_k = cfg.replace(speaker=cfg.speaker.replace(
        decode_kernel="pallas_interpret"))
    model = EkaidModel(cfg_k, ntoken=NTOKEN, policy=F32, decode_mesh=mesh)
    small = jax.tree.map(lambda x: x[:3], batch)
    with pytest.raises(AssertionError, match="not divisible"):
        model.apply(params, small, method="decode", sample_max=True)


def test_kernel_rejects_conflicting_knobs(setup):
    """weight_quant/fused_core rewrite the XLA scan step; the pallas
    kernel replaces that loop wholesale — a combined config must fail
    loudly, not silently measure plain pallas (review finding r3)."""
    cfg, batch, params = setup
    for knob in ({"weight_quant": "int8"}, {"fused_core": True}):
        bad = cfg.replace(speaker=cfg.speaker.replace(
            decode_kernel="pallas_interpret", **knob))
        model = EkaidModel(bad, ntoken=NTOKEN, policy=F32)
        with pytest.raises(ValueError, match="decode_kernel"):
            model.apply(params, batch, method="decode", sample_max=True)
