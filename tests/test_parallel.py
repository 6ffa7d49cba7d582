"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The TPU-native substitute for distributed-backend tests (SURVEY.md §4):
full train step jitted over data×model meshes, checking loss equivalence
against the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.data.synthetic import synthetic_batch
from ekaid_tpu.models.ekaid import EkaidModel
from ekaid_tpu.parallel.mesh import make_mesh, shard_batch
from ekaid_tpu.train.step import (init_state, make_jitted_steps,
                                  make_optimizer)
from ekaid_tpu.utils.dtypes import F32


def tiny_config():
    cfg = default_config()
    return cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=32, rnn_size=16, embed_input_dim=96, embed_dim=32,
            word_embed_size=8, vocab_size=148, seq_length=6),
        data=cfg.data.replace(num_nodes=6, feature_dim=24, adj_pad=10),
        question=cfg.question.replace(hidden_dim=32),
    )


def build(cfg, batch_size, seed=0):
    model = EkaidModel(cfg, ntoken=147, policy=F32)
    batch = jax.tree.map(jnp.asarray,
                         synthetic_batch(cfg, batch_size, seed=seed))
    tx = make_optimizer(cfg.train.optim)
    state = init_state(model, tx, batch, jax.random.PRNGKey(0))
    return model, batch, tx, state


def test_eight_devices_available():
    assert jax.device_count() == 8


@pytest.mark.parametrize("data,model_ax", [(8, 1), (4, 2)])
def test_sharded_train_step_runs(data, model_ax):
    cfg = tiny_config()
    model, batch, tx, state = build(cfg, batch_size=8)
    mesh = make_mesh(data=data, model=model_ax)
    make_train, jit_eval, state = make_jitted_steps(
        model, tx, cfg.train.att_reg_weight, mesh, state, batch)
    jit_train = make_train(0.0)
    batch = shard_batch(mesh, batch)
    state, metrics = jit_train(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1
    out = jit_eval(state, batch)
    assert out["seq"].shape == (8, cfg.speaker.seq_length)


def test_dp_matches_single_device_loss():
    """The sharded step must compute the same loss/grads as unsharded."""
    cfg = tiny_config()
    model, batch, tx, state0 = build(cfg, batch_size=8)

    # single-device reference (mesh 1x1 on one device)
    mesh1 = make_mesh(devices=jax.devices()[:1], data=1, model=1)
    mk1, _, s1 = make_jitted_steps(model, tx, cfg.train.att_reg_weight,
                                   mesh1, state0, batch)
    jt1 = mk1(0.0)
    s1, m1 = jt1(s1, shard_batch(mesh1, batch), jax.random.PRNGKey(1))

    model2, batch2, tx2, state2 = build(cfg, batch_size=8)
    mesh8 = make_mesh(data=8, model=1)
    mk8, _, s8 = make_jitted_steps(model2, tx2, cfg.train.att_reg_weight,
                                   mesh8, state2, batch2)
    jt8 = mk8(0.0)
    s8, m8 = jt8(s8, shard_batch(mesh8, batch2), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=2e-5)
    # parameters after one step agree
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_tp_params_actually_sharded():
    cfg = tiny_config()
    model, batch, tx, state = build(cfg, batch_size=8)
    mesh = make_mesh(data=4, model=2)
    _, _, state = make_jitted_steps(model, tx, cfg.train.att_reg_weight,
                                    mesh, state, batch)
    logit_kernel = state.params["params"]["speaker"]["logit"]["kernel"]
    spec = logit_kernel.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model"), spec


def test_loss_decreases_over_steps():
    cfg = tiny_config()
    cfg = cfg.replace(train=cfg.train.replace(
        optim=cfg.train.optim.replace(lr=3e-3)))
    model, batch, tx, state = build(cfg, batch_size=8)
    mesh = make_mesh(data=8, model=1)
    make_train, _, state = make_jitted_steps(
        model, tx, cfg.train.att_reg_weight, mesh, state, batch)
    jit_train = make_train(0.0)
    batch = shard_batch(mesh, batch)
    losses = []
    rng = jax.random.PRNGKey(2)
    for _ in range(60):
        state, metrics = jit_train(state, batch, rng)
        losses.append(float(metrics["speaker_loss"]))
    assert losses[-1] < losses[0] * 0.6, losses[::15]


def test_dryrun_multichip_entrypoint():
    """The driver contract: full sharded train step on N virtual devices."""
    import sys
    sys.path.insert(0, "/root/repo")
    import importlib
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(8)          # tp+dp mesh 4x2
    ge.dryrun_multichip(2)          # dp-only mesh 2x1


@pytest.mark.parametrize("model_ax", [2, 4])
def test_flagship_config_tp_rules_divide(model_ax):
    """Every DEFAULT_PARAM_RULES entry must actually shard at the
    FLAGSHIP geometry (VERDICT r1: the divisibility fallback silently
    replicates — this fails if a TP rule stops dividing at real sizes).
    Shapes come from eval_shape (no full-size init compute)."""
    from ekaid_tpu.parallel.mesh import (DEFAULT_PARAM_RULES,
                                         param_shardings, _path_str)

    cfg = default_config()          # flagship dims (1024-d, vocab 148)
    model = EkaidModel(cfg, ntoken=147, policy=F32)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 8, seed=0))
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True))

    mesh = make_mesh(data=8 // model_ax, model=model_ax)
    shardings = param_shardings(mesh, shapes)

    import re
    compiled = [(re.compile(p), spec) for p, spec in DEFAULT_PARAM_RULES]
    seen = {p: 0 for p, _ in DEFAULT_PARAM_RULES}

    def check(path, leaf_shape, sharding):
        s = _path_str(path)
        for (pat, spec), (pstr, _) in zip(compiled, DEFAULT_PARAM_RULES):
            if pat.match(s):
                seen[pstr] += 1
                assert sharding.spec == spec, (
                    f"{s} {leaf_shape.shape} fell back to "
                    f"{sharding.spec} on model={model_ax} "
                    f"(rule {pstr} -> {spec})")
                return

    jax.tree_util.tree_map_with_path(
        lambda p, l, sh: check(p, l, sh), shapes, shardings)
    for pat, n in seen.items():
        assert n > 0, f"rule {pat} matched no parameter"


def test_sharded_extraction_matches_single_device():
    """Data-parallel extraction over the 8-device CPU mesh must equal
    the single-device program (same params: default PRNGKey(0) init),
    and the per-shard split must be purely along the batch."""
    from ekaid_tpu.extract.runner import build_detector_fns

    cfg = default_config()
    cfg = cfg.replace(
        detector=cfg.detector.replace(
            image_size=64, fpn_channels=16, roi_feat_dim=32,
            pre_nms_topk=50, post_nms_topk=32, extract_batch_size=8),
        # f32: at bf16, XLA's per-program reassociation flips NMS picks
        # between near-tied random-weight scores, so cross-program
        # equality only holds at f32 (verified: eager bf16 IS
        # batch-consistent; the flips are jit-optimization artifacts)
        dtypes=cfg.dtypes.replace(compute_dtype="float32"))
    single, _ = build_detector_fns(cfg)
    mesh = make_mesh(data=8, model=1)
    sharded, _ = build_detector_fns(cfg, mesh=mesh)

    imgs = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (8, 64, 64, 3)), jnp.float32)
    want = jax.tree.map(np.asarray, single(imgs))
    got = jax.tree.map(np.asarray, sharded(imgs))
    assert want["features"].shape == got["features"].shape
    np.testing.assert_allclose(got["features"], want["features"],
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_array_equal(got["found"], want["found"])


def test_grad_accumulation_matches_full_batch():
    """train.accum_steps is a pure memory knob: in the deterministic
    (train=False — several dropout rates are reference-parity
    hard-coded) step, accum in {2, 4} must reproduce the accum=1 loss
    and post-step params exactly: each microbatch term is normalized
    by the FULL batch's mask sum / size, so terms sum to the batch
    loss (train/step.py)."""
    from functools import partial

    import optax

    from ekaid_tpu.train.step import init_state, train_step

    cfg = tiny_config()
    results = {}
    for accum in (1, 2, 4):
        model, batch, _, _ = build(cfg, batch_size=8)
        # SGD, not Adam: post-step params are then LINEAR in the grads,
        # so grad equality is tested directly (Adam's m/sqrt(v) flips
        # sign on near-zero-grad params under f32 summation reorder)
        tx = optax.sgd(0.1)
        state = init_state(model, tx, batch, jax.random.PRNGKey(0))
        step = jax.jit(partial(train_step, model, tx,
                               cfg.train.att_reg_weight,
                               accum_steps=accum, train=False))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        results[accum] = (state, float(metrics["total_loss"]),
                          float(metrics["grad_norm"]))
    _, loss1, gn1 = results[1]
    for accum in (2, 4):
        state, loss, gn = results[accum]
        np.testing.assert_allclose(loss, loss1, rtol=1e-6)
        np.testing.assert_allclose(gn, gn1, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(results[1][0].params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_grad_accumulation_sharded_step_runs():
    """accum under the data×model mesh: one step, finite loss (the
    strided interleave keeps every microbatch sharded over 'data')."""
    cfg = tiny_config()
    model, batch, tx, state = build(cfg, batch_size=8)
    mesh = make_mesh(data=4, model=2)
    mk, _, state = make_jitted_steps(
        model, tx, cfg.train.att_reg_weight, mesh, state, batch,
        accum_steps=2)
    state, metrics = mk(0.0)(state, shard_batch(mesh, batch),
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


def test_grad_accumulation_rejects_indivisible_batch():
    from functools import partial

    from ekaid_tpu.train.step import train_step

    cfg = tiny_config()
    model, batch, tx, state = build(cfg, batch_size=8)
    with pytest.raises(ValueError, match="accum_steps"):
        jax.jit(partial(train_step, model, tx, cfg.train.att_reg_weight,
                        accum_steps=3))(state, batch,
                                        jax.random.PRNGKey(1))
