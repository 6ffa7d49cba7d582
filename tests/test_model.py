"""Model forward/decode smoke + semantics tests (batch=1 CPU, f32).

Covers SURVEY.md §4's golden-shape layer: every module at small batch,
plus invariants derivable from the reference semantics (masking, EOS
stopping, loss masking, scheduled-sampling plumbing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.data.synthetic import synthetic_batch
from ekaid_tpu.models.ekaid import (EkaidModel, language_model_loss,
                                    total_loss)
from ekaid_tpu.utils.dtypes import F32

VOCAB = 148
NTOKEN = 147


def tiny_config():
    cfg = default_config()
    return cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=64, att_head=4, dim=16, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=64, rnn_size=32, embed_input_dim=192, embed_dim=64,
            word_embed_size=24, vocab_size=VOCAB, seq_length=12),
        data=cfg.data.replace(num_nodes=8, feature_dim=48, adj_pad=20),
        question=cfg.question.replace(hidden_dim=64),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 2, seed=1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sample": jax.random.PRNGKey(2)},
        batch, train=True)
    return cfg, model, batch, params


def test_forward_shapes(setup):
    cfg, model, batch, params = setup
    out = model.apply(params, batch, train=False)
    B, T, V = 2, cfg.speaker.seq_length, VOCAB
    assert out["logprobs"].shape == (B, T, V)
    assert out["pos_logprobs"].shape == (B, T, 16)
    assert out["module_weights"].shape == (B, T, 3)
    assert out["pred"].shape == (B, 6)
    assert out["att_bef"].shape == (B, 1, cfg.data.num_nodes)
    assert out["feat_diff"].shape == (B, cfg.change_detector.att_dim)
    # logprobs are a valid log-distribution
    np.testing.assert_allclose(
        np.exp(np.asarray(out["logprobs"])).sum(-1), 1.0, rtol=1e-4)
    # module weights softmax to 1
    np.testing.assert_allclose(
        np.asarray(out["module_weights"]).sum(-1), 1.0, rtol=1e-4)
    # attention weights are sigmoid outputs
    att = np.asarray(out["att_bef"])
    assert ((att > 0) & (att < 1)).all()


def test_forward_deterministic_eval(setup):
    _, model, batch, params = setup
    o1 = model.apply(params, batch, train=False)
    o2 = model.apply(params, batch, train=False)
    np.testing.assert_array_equal(np.asarray(o1["logprobs"]),
                                  np.asarray(o2["logprobs"]))


def test_train_dropout_stochastic(setup):
    _, model, batch, params = setup
    rngs1 = {"dropout": jax.random.PRNGKey(10)}
    rngs2 = {"dropout": jax.random.PRNGKey(11)}
    o1 = model.apply(params, batch, train=True, rngs=rngs1)
    o2 = model.apply(params, batch, train=True, rngs=rngs2)
    assert not np.allclose(np.asarray(o1["logprobs"]),
                           np.asarray(o2["logprobs"]))


def test_decode_greedy(setup):
    cfg, model, batch, params = setup
    out = model.apply(params, batch, method="decode", sample_max=True)
    seq = np.asarray(out["seq"])
    assert seq.shape == (2, cfg.speaker.seq_length)
    assert seq.dtype == np.int32
    # 0-terminated: after the first 0, everything is 0 (unfinished mask)
    for row in seq:
        if (row == 0).any():
            first = int(np.argmax(row == 0))
            assert (row[first:] == 0).all()
    # greedy decode is deterministic
    out2 = model.apply(params, batch, method="decode", sample_max=True)
    np.testing.assert_array_equal(seq, np.asarray(out2["seq"]))


def test_decode_multinomial(setup):
    _, model, batch, params = setup
    o1 = model.apply(params, batch, method="decode", sample_max=False,
                     rng=jax.random.PRNGKey(3))
    o2 = model.apply(params, batch, method="decode", sample_max=False,
                     rng=jax.random.PRNGKey(4))
    assert not np.array_equal(np.asarray(o1["seq"]), np.asarray(o2["seq"]))


def test_language_model_loss_masking():
    logp = jnp.log(jnp.full((1, 3, 4), 0.25))
    tgt = jnp.asarray([[1, 2, 3]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    loss = language_model_loss(logp, tgt, mask)
    np.testing.assert_allclose(float(loss), -np.log(0.25), rtol=1e-6)


def test_total_loss_finite(setup):
    cfg, model, batch, params = setup
    out = model.apply(params, batch, train=False)
    loss, aux = total_loss(out, batch, cfg.train.att_reg_weight)
    assert np.isfinite(float(loss))
    assert float(aux["speaker_loss"]) > 0
    assert float(aux["att_reg"]) > 0


def test_total_loss_entropy_term(setup):
    """train.entropy_weight subtracts the module-attention entropy
    bonus (the reference's commented -w * EntropyLoss,
    train_mimic.py:244), checked against a per-element numpy oracle;
    weight 0 must leave the loss and aux untouched."""
    cfg, model, batch, params = setup
    out = model.apply(params, batch, train=False)
    base, aux0 = total_loss(out, batch, cfg.train.att_reg_weight)
    assert "entropy" not in aux0
    w = np.asarray(out["module_weights"], np.float64)          # [B,T,3]
    m = np.asarray(batch["masks"], np.float64)[:, 1:w.shape[1] + 1]
    ent = -(w * np.log(np.maximum(w, 1e-12))
            * m[..., None]).sum() / w.shape[0]
    loss, aux = total_loss(out, batch, cfg.train.att_reg_weight,
                           entropy_weight=0.3)
    np.testing.assert_allclose(float(aux["entropy"]), ent, rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(base) - 0.3 * ent,
                               rtol=1e-5)


def test_gradients_flow(setup):
    cfg, model, batch, params = setup

    def loss_fn(p):
        out = model.apply(p, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(5)})
        return total_loss(out, batch, cfg.train.att_reg_weight)[0]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.sum(g * g)),
                                        grads))
    assert all(np.isfinite(flat))
    total_sq = float(np.sum(flat))
    assert total_sq > 0
    # the frozen word-embedding copy must receive zero gradient
    fixed_g = grads["params"]["change_detector"]["question"][
        "WordEmbedding_0"]["emb_fixed"]
    assert float(jnp.abs(fixed_g).max()) == 0.0


def test_scheduled_sampling_path(setup):
    cfg, model, batch, params = setup
    out = model.apply(
        params, batch, ss_prob=0.5, train=True,
        rngs={"dropout": jax.random.PRNGKey(6),
              "sample": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(out["logprobs"])).all()


def test_graph_variants_build():
    cfg = tiny_config()
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 1, seed=2))
    for graph in ["semantic", "spatial", "implicit", "i+s"]:
        c = cfg.replace(train=cfg.train.replace(graph=graph))
        model = EkaidModel(c, ntoken=NTOKEN, policy=F32)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, batch, train=False)
        out = model.apply(params, batch, train=False)
        assert np.isfinite(np.asarray(out["logprobs"])).all(), graph


def test_branch_mix_and_dir_reduce_variants():
    cfg = tiny_config()
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 1, seed=3))
    outs = {}
    for mix in ["sequential", "parallel"]:
        for dr in ["reference", "sum"]:
            c = cfg.replace(change_detector=cfg.change_detector.replace(
                branch_mix=mix, dir_reduce=dr))
            model = EkaidModel(c, ntoken=NTOKEN, policy=F32)
            params = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, batch, train=False)
            out = model.apply(params, batch, train=False)
            outs[(mix, dr)] = np.asarray(out["feat_diff"])
            assert np.isfinite(outs[(mix, dr)]).all()
    # the variants genuinely differ
    assert not np.allclose(outs[("sequential", "reference")],
                           outs[("parallel", "reference")])
    assert not np.allclose(outs[("sequential", "reference")],
                           outs[("sequential", "sum")])


def test_beam_search(setup):
    cfg, model, batch, params = setup

    def run_beam(p, b, w):
        enc = model.apply(p, b, method="encode")
        return model.apply(
            p, b,
            method=lambda m, bb: m.speaker.sample_beam(
                enc["feat_bef"], enc["feat_aft"], enc["feat_diff"],
                beam_size=w))

    out3 = run_beam(params, batch, 3)
    seq = np.asarray(out3["seq"])
    assert seq.shape == (2, cfg.speaker.seq_length)
    assert np.isfinite(np.asarray(out3["logprob"])).all()
    # note: beam search suppresses token index 1 (CaptionModel.py:137),
    # so it need not match greedy decode; wider beams explore a superset
    # of beam-1, so the best joint logprob must not get worse
    out1 = run_beam(params, batch, 1)
    assert (np.asarray(out3["logprob"])
            >= np.asarray(out1["logprob"]) - 1e-4).all()
    # token 1 never appears (suppressed)
    assert (seq != 1).all()
    # deterministic
    out3b = run_beam(params, batch, 3)
    np.testing.assert_array_equal(seq, np.asarray(out3b["seq"]))


def test_mode0_pixels_path():
    cfg = tiny_config()
    cfg = cfg.replace(train=cfg.train.replace(setting="mode0"))
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    rng = np.random.default_rng(4)
    batch = synthetic_batch(cfg, 1, seed=4)
    # pixels replace node features (dataset mode0 returns 128x128 images;
    # use 64x64 here for speed)
    batch["d_feats"] = rng.standard_normal((1, 64, 64)).astype(np.float32)
    batch["q_feats"] = rng.standard_normal((1, 64, 64)).astype(np.float32)
    batch = jax.tree.map(jnp.asarray, batch)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False)
    out = model.apply(params, batch, train=False)
    assert np.isfinite(np.asarray(out["logprobs"])).all()
    # node axis = 2x2 cells of the 64x64 image (stride 32)
    assert out["att_bef"].shape == (1, 1, 4)


def test_early_exit_decode_matches_scan(setup):
    cfg, model, batch, params = setup
    # train briefly... not needed: even untrained, outputs must be equal
    def dec(ee):
        enc = model.apply(params, batch, method="encode")
        return model.apply(
            params, batch,
            method=lambda m, b: m.speaker.sample(
                enc["feat_bef"], enc["feat_aft"], enc["feat_diff"],
                sample_max=True, early_exit=ee))
    a = dec(True)
    b = dec(False)
    np.testing.assert_array_equal(np.asarray(a["seq"]),
                                  np.asarray(b["seq"]))
    np.testing.assert_allclose(np.asarray(a["logprobs"]),
                               np.asarray(b["logprobs"]), rtol=1e-5,
                               atol=1e-6)


def test_gat_edge_masking_blocks_influence():
    """Non-neighbor features must not affect a node's GAT output
    (graph_att_layer.py:137-154 masking semantics)."""
    from ekaid_tpu.models.gat import GAttNet
    rng = np.random.default_rng(0)
    B, N, D = 1, 6, 32
    v = rng.standard_normal((B, N, D)).astype(np.float32)
    # edges only among nodes 0..2 (fully connected block, label 1)
    adj = np.zeros((B, N, N, 2), np.float32)
    adj[:, :3, :3, 0] = 1.0
    net = GAttNet(dir_num=2, label_num=2, in_feat_dim=D, out_feat_dim=D,
                  nongt_dim=N, dir_reduce="sum")
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(v),
                      jnp.asarray(adj))
    out1 = np.asarray(net.apply(params, jnp.asarray(v), jnp.asarray(adj)))
    # perturb an isolated node (5): nodes 0..2 must be unchanged
    v2 = v.copy()
    v2[:, 5] += 10.0
    out2 = np.asarray(net.apply(params, jnp.asarray(v2),
                                jnp.asarray(adj)))
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], rtol=1e-5,
                               atol=1e-5)
    # but perturbing a neighbor (1) must change node 0's output
    v3 = v.copy()
    v3[:, 1] += 10.0
    out3 = np.asarray(net.apply(params, jnp.asarray(v3),
                                jnp.asarray(adj)))
    assert not np.allclose(out1[:, 0], out3[:, 0], rtol=1e-3)


def test_gat_reference_mode_uses_transposed_direction():
    """dir_reduce='reference' output must equal 2x the direction-1
    (transposed-adjacency) attention — the executed graph_att.py:95-102
    semantics."""
    from ekaid_tpu.models.gat import GAttNet
    rng = np.random.default_rng(1)
    B, N, D = 2, 5, 16
    v = rng.standard_normal((B, N, D)).astype(np.float32)
    adj = (rng.random((B, N, N, 3)) > 0.6).astype(np.float32)
    ref = GAttNet(dir_num=2, label_num=3, in_feat_dim=D, out_feat_dim=D,
                  nongt_dim=N, dir_reduce="reference")
    params = ref.init(jax.random.PRNGKey(0), jnp.asarray(v),
                      jnp.asarray(adj))
    out_ref = np.asarray(ref.apply(params, jnp.asarray(v),
                                   jnp.asarray(adj)))
    # asymmetric adjacency -> transposing it must change the output
    out_t = np.asarray(ref.apply(params, jnp.asarray(v),
                                 jnp.swapaxes(jnp.asarray(adj), 1, 2)))
    assert not np.allclose(out_ref, out_t)


def test_diverse_beam_matches_reference_oracle(setup):
    """Diverse-group beam search vs a per-sample Python oracle that
    mirrors CaptionModel.beam_search exactly (staggered group schedule,
    add_diversity stacking subtraction, beam_step candidate fork,
    finalize-on-0 / finalize-all-at-T, per-group sort by augmented p)."""
    cfg, model, batch, params = setup
    T = cfg.speaker.seq_length
    V = VOCAB
    W_TOTAL, G, LAM = 4, 2, 0.5
    BDASH = W_TOTAL // G

    enc = model.apply(params, batch, method="encode")

    out = model.apply(
        params, batch,
        method=lambda m, bb: m.speaker.sample_beam(
            enc["feat_bef"], enc["feat_aft"], enc["feat_diff"],
            beam_size=W_TOTAL, group_size=G, diversity_lambda=LAM))
    got_gseqs = np.asarray(out["group_seqs"])        # [B, G, T]
    got_gps = np.asarray(out["group_logprobs"])      # [B, G]

    def step_fn(k, it, state):
        """One decoder step on BDASH beams of sample k (the reference's
        get_logprobs_state), incl. the index-1 suppression."""
        fb = jnp.broadcast_to(enc["feat_bef"][k], (BDASH,) +
                              enc["feat_bef"][k].shape)
        fa = jnp.broadcast_to(enc["feat_aft"][k], fb.shape)
        fd = jnp.broadcast_to(enc["feat_diff"][k], fb.shape)

        def m(mdl):
            fused, feats = mdl.speaker._fused(fb, fd, fa, None)
            xt = mdl.speaker._embed_word(jnp.asarray(it, jnp.int32), None)
            h_lang, ns, dpos, _ = mdl.speaker.core(
                xt, fused, feats,
                {kk: jnp.asarray(vv) for kk, vv in state.items()},
                drop_key=None)
            logp, _ = mdl.speaker._out_logprobs(h_lang, dpos, None)
            logp = logp - jnp.where(jnp.arange(V)[None] == 1, 1000.0,
                                    0.0)
            return logp, ns
        logp, ns = model.apply(params, method=m)
        return (np.asarray(logp, np.float64),
                {kk: np.asarray(vv) for kk, vv in ns.items()})

    def init_state():
        return {kk: np.zeros((BDASH, cfg.speaker.rnn_size), np.float32)
                for kk in ("h_mod", "c_mod", "h_lang", "c_lang")}

    def oracle(k):
        beam_seq = [np.zeros((T, BDASH), int) for _ in range(G)]
        sums = [np.zeros(BDASH) for _ in range(G)]
        state, logprobs_t = [], []
        for g in range(G):
            lp, st = step_fn(k, np.full(BDASH, cfg.speaker.bos_token),
                             init_state())
            logprobs_t.append(lp)
            state.append(st)
        done = [[] for _ in range(G)]
        for t in range(T + G - 1):
            for g in range(G):
                if not (g <= t <= T + g - 1):
                    continue
                lt = t - g
                logp = logprobs_t[g].copy()
                for p in range(G):
                    if p < g:
                        for tokn in beam_seq[p][lt]:
                            logp[:, tokn] -= LAM     # stacking subtraction
                rows = 1 if lt == 0 else BDASH
                ix = np.argsort(-logp, axis=1)
                cands = []
                for cc in range(min(BDASH, V)):
                    for q in range(rows):
                        cands.append((int(ix[q, cc]), q,
                                      sums[g][q] + logp[q, ix[q, cc]]))
                cands.sort(key=lambda x: -x[2])
                new_seq = beam_seq[g].copy()
                prev_seq = beam_seq[g][:lt].copy()
                new_state = {kk: vv.copy() for kk, vv in
                             state[g].items()}
                new_sums = sums[g].copy()
                for vix in range(BDASH):
                    c_tok, q, p_sum = cands[vix]
                    if lt >= 1:
                        new_seq[:lt, vix] = prev_seq[:, q]
                    for kk in new_state:
                        new_state[kk][vix] = state[g][kk][q]
                    new_seq[lt, vix] = c_tok
                    new_sums[vix] = p_sum
                beam_seq[g], state[g], sums[g] = (new_seq, new_state,
                                                  new_sums)
                for vix in range(BDASH):
                    if beam_seq[g][lt, vix] == 0 or lt == T - 1:
                        done[g].append((beam_seq[g][:, vix].copy(),
                                        sums[g][vix]))
                        sums[g][vix] = -1000.0
                it = beam_seq[g][lt]
                lp, st = step_fn(k, it, state[g])
                logprobs_t[g] = lp
                state[g] = st
        return [max(d, key=lambda x: x[1]) for d in done]

    for k in range(2):
        best = oracle(k)
        for g in range(G):
            want_seq, want_p = best[g]
            np.testing.assert_allclose(got_gps[k, g], want_p, rtol=2e-3,
                                       atol=2e-3,
                                       err_msg=f"sample {k} group {g}")
            np.testing.assert_array_equal(
                got_gseqs[k, g], want_seq,
                err_msg=f"sample {k} group {g}")
    # group 0's best is the returned answer (done_beams[0],
    # dynamic_speaker_change_pos.py:280)
    np.testing.assert_array_equal(np.asarray(out["seq"]),
                                  got_gseqs[:, 0])


def test_inference_param_cast_preserves_decode():
    """bf16 pre-cast params decode identically to f32 params under the
    BF16 policy (the per-use cast applies the same rounding)."""
    from ekaid_tpu.utils.dtypes import BF16, cast_params_for_inference

    cfg = tiny_config()
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=BF16)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 2, seed=3))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    cast = cast_params_for_inference(params, BF16)
    out_a = model.apply(params, batch, method="decode", sample_max=True)
    out_b = model.apply(cast, batch, method="decode", sample_max=True)
    np.testing.assert_array_equal(np.asarray(out_a["seq"]),
                                  np.asarray(out_b["seq"]))


def test_scan_unroll_invariant():
    """speaker.scan_unroll is a pure scheduling knob — decode outputs
    must be identical for any unroll factor."""
    cfg1 = tiny_config()
    cfg2 = cfg1.replace(speaker=cfg1.speaker.replace(scan_unroll=3))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg1, 2, seed=5))
    m1 = EkaidModel(cfg1, ntoken=NTOKEN, policy=F32)
    m2 = EkaidModel(cfg2, ntoken=NTOKEN, policy=F32)
    params = m1.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    a = m1.apply(params, batch, method="decode", sample_max=True,
                 early_exit=False)
    b = m2.apply(params, batch, method="decode", sample_max=True,
                 early_exit=False)
    np.testing.assert_array_equal(np.asarray(a["seq"]),
                                  np.asarray(b["seq"]))


def test_fused_core_decode_equivalence():
    """speaker.fused_core merges the independent per-step matmuls into
    one wide dispatch — same params, same answers (f32)."""
    cfg1 = tiny_config()
    cfg2 = cfg1.replace(speaker=cfg1.speaker.replace(fused_core=True))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg1, 2, seed=6))
    m1 = EkaidModel(cfg1, ntoken=NTOKEN, policy=F32)
    m2 = EkaidModel(cfg2, ntoken=NTOKEN, policy=F32)
    params = m1.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    a = m1.apply(params, batch, method="decode", sample_max=True,
                 early_exit=False)
    b = m2.apply(params, batch, method="decode", sample_max=True,
                 early_exit=False)
    np.testing.assert_array_equal(np.asarray(a["seq"]),
                                  np.asarray(b["seq"]))
    np.testing.assert_allclose(np.asarray(a["logprobs"]),
                               np.asarray(b["logprobs"]),
                               atol=1e-4, rtol=1e-4)


def test_inference_cast_protects_named_weight_norm():
    """Weight-norm {v, g} pairs must stay f32 regardless of the module
    NAME (the old 'WNDense' substring match broke for explicitly-named
    modules); ordinary kernels cast."""
    from ekaid_tpu.utils.dtypes import BF16, cast_params_for_inference

    params = {"params": {
        "proj": {"v": jnp.ones((4, 2), jnp.float32),
                 "g": jnp.ones((2,), jnp.float32),
                 "bias": jnp.ones((2,), jnp.float32)},
        "dense": {"kernel": jnp.ones((4, 2), jnp.float32),
                  "bias": jnp.ones((2,), jnp.float32)}}}
    out = cast_params_for_inference(params, BF16)
    assert out["params"]["proj"]["v"].dtype == jnp.float32
    assert out["params"]["proj"]["g"].dtype == jnp.float32
    assert out["params"]["dense"]["kernel"].dtype == jnp.bfloat16
    assert out["params"]["dense"]["bias"].dtype == jnp.bfloat16


def test_quantize_matrix_error_bound():
    """Per-channel int8: |w - q*s| <= s/2 elementwise (half a level)."""
    from ekaid_tpu.models.quant import quantize_matrix

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.3
    q, s = quantize_matrix(w)
    assert q.dtype == jnp.int8 and s.shape == (48,)
    err = np.abs(np.asarray(w) - np.asarray(q, np.float32) * np.asarray(s))
    assert (err <= np.asarray(s)[None, :] / 2 + 1e-7).all()


def test_quant_core_step_matches_module():
    """make_quant_core_step reproduces DynamicCore's eval step within
    the int8 rounding budget (the large kernels round to 127 levels;
    everything else is exact under F32)."""
    from ekaid_tpu.models.decoder import DynamicSpeaker
    from ekaid_tpu.models.quant import (QUANT_MIN_ELEMS,
                                        make_quant_core_step)

    # mid-size dims so the big kernels cross QUANT_MIN_ELEMS and the
    # int8 dequant branch is actually exercised (gate1x 512x512 etc.)
    cfg = tiny_config().speaker.replace(
        input_dim=256, rnn_size=128, embed_dim=256, embed_input_dim=768)
    spk = DynamicSpeaker(cfg, policy=F32)
    B, D = 2, cfg.input_dim
    rng = jax.random.PRNGKey(7)
    fb, fd, fa = (jax.random.normal(k, (B, D))
                  for k in jax.random.split(rng, 3))
    variables = spk.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        fb, fa, fd, sample_max=True, method="sample")
    core_params = variables["params"]["core"]
    # at tiny dims no kernel may cross the int8 threshold — force at
    # least one by dropping the threshold via monkeypatching is avoided;
    # instead check both regimes explicitly below
    step_q = make_quant_core_step(core_params, cfg, F32)

    def module_step(xt, fused, feats, state):
        from ekaid_tpu.models.decoder import DynamicCore
        core = DynamicCore(cfg, policy=F32)
        return core.apply({"params": core_params}, xt, fused, feats,
                          state, drop_key=None)

    xt = jax.random.normal(jax.random.PRNGKey(2),
                           (B, cfg.word_embed_size))
    fused = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.embed_dim))
    feats = jax.random.normal(jax.random.PRNGKey(4), (B, 3, D))
    state = {k: jnp.zeros((B, cfg.rnn_size))
             for k in ("h_mod", "c_mod", "h_lang", "c_lang")}

    ha, sa, da, ma = module_step(xt, fused, feats, state)
    hb, sb, db, mb = step_q(xt, fused, feats, state)
    quantized_any = any(
        v.ndim == 2 and v.size >= QUANT_MIN_ELEMS
        for sub in core_params.values() for v in sub.values())
    assert quantized_any, "dims chosen to cross QUANT_MIN_ELEMS"
    tol = 5e-2
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=tol)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=tol)
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=tol)
    for k in sa:
        np.testing.assert_allclose(np.asarray(sa[k]), np.asarray(sb[k]),
                                   atol=tol)


def test_quant_decode_smoke_and_tiny_exact():
    """weight_quant='int8' decodes valid sequences; at tiny dims every
    kernel is below the quantization threshold, so the path must be
    numerically identical to the baseline (proves the step wiring)."""
    cfg1 = tiny_config()
    cfg2 = cfg1.replace(speaker=cfg1.speaker.replace(weight_quant="int8"))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg1, 2, seed=8))
    m1 = EkaidModel(cfg1, ntoken=NTOKEN, policy=F32)
    m2 = EkaidModel(cfg2, ntoken=NTOKEN, policy=F32)
    params = m1.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    a = m1.apply(params, batch, method="decode", sample_max=True,
                 early_exit=False)
    b = m2.apply(params, batch, method="decode", sample_max=True,
                 early_exit=False)
    assert b["seq"].shape == a["seq"].shape
    from ekaid_tpu.models.quant import QUANT_MIN_ELEMS
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(params["params"])
    core_kernels = [v for k, v in flat.items() if "core" in k]
    if all(not (v.ndim == 2 and v.size >= QUANT_MIN_ELEMS)
           for v in core_kernels):
        np.testing.assert_array_equal(np.asarray(a["seq"]),
                                      np.asarray(b["seq"]))


def test_remat_grads_match():
    """speaker.remat is a pure scheduling knob: losses and gradients
    must match the no-remat baseline (same math, recomputed)."""
    cfg1 = tiny_config()
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg1, 2, seed=9))
    m1 = EkaidModel(cfg1, ntoken=NTOKEN, policy=F32)
    params = m1.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)

    def loss_for(cfg):
        model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)

        def f(p):
            out = model.apply(p, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            loss, _ = total_loss(out, batch, cfg.train.att_reg_weight)
            return loss

        return jax.value_and_grad(f)(params)

    l0, g0 = loss_for(cfg1)
    for mode in ("dots", "full"):
        cfgr = cfg1.replace(speaker=cfg1.speaker.replace(remat=mode))
        l1, g1 = loss_for(cfgr)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        flat0 = jax.tree.leaves(g0)
        flat1 = jax.tree.leaves(g1)
        for x, y in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5, rtol=1e-5)


def test_length_bucket_trim_is_loss_and_grad_identical():
    """Answer-length bucketing (trim_batch_to_bucket + shape-driven
    teacher-forcing scan): the trimmed batch must produce the exact
    same loss and gradients as the full-length batch — the trailing
    steps are fully masked, so their contributions are exact zeros.
    Dropout off (rate knobs untouched but train=False disables it;
    grads still flow) and additionally train=True with a fixed rng at
    zero scheduled sampling, where dropout randomness differs per scan
    length only in masked-out steps' keys."""
    from ekaid_tpu.data.pipeline import trim_batch_to_bucket

    cfg = tiny_config()                      # seq_length 12
    batch = synthetic_batch(cfg, 3, seed=11)  # answer lengths < 6
    need = int(batch["masks"].sum(1).max()) - 1
    assert need < 8 < cfg.speaker.seq_length
    trimmed = trim_batch_to_bucket(batch, (8,), cfg.speaker.seq_length)
    assert trimmed["labels"].shape[1] == 9
    assert trimmed["masks"].shape[1] == 9

    full = jax.tree.map(jnp.asarray, batch)
    trim = jax.tree.map(jnp.asarray, trimmed)
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        full, train=True)

    def loss_fn(p, b, train):
        out = model.apply(p, b, train=train,
                          rngs={"dropout": jax.random.PRNGKey(2)}
                          if train else None)
        return total_loss(out, b, cfg.train.att_reg_weight)[0]

    # eval-mode (no dropout): bit-identical loss AND grads
    lf, gf = jax.value_and_grad(loss_fn)(params, full, False)
    lt, gt = jax.value_and_grad(loss_fn)(params, trim, False)
    assert float(lf) == float(lt)
    for x, y in zip(jax.tree.leaves(gf), jax.tree.leaves(gt)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # train-mode sanity: finite and close (dropout key schedules differ
    # with scan length, so exact equality is not expected)
    lf2 = loss_fn(params, full, True)
    lt2 = loss_fn(params, trim, True)
    assert np.isfinite(float(lf2)) and np.isfinite(float(lt2))


def test_decode_accepts_compact_wire(setup):
    """The compact H2D wire (f16 feats, int8 adjacency —
    data/pipeline.compact_wire) must flow through the full decode: the
    one-hot adjacency is bit-identical, so only feature rounding to the
    f16 grid can perturb logits."""
    from ekaid_tpu.data.pipeline import compact_wire
    cfg, model, batch, params = setup
    host = jax.tree.map(np.asarray, batch)
    compact = jax.tree.map(jnp.asarray, compact_wire(host))
    out_w = model.apply(params, batch, method="decode", sample_max=True)
    out_c = model.apply(params, compact, method="decode", sample_max=True)
    assert out_c["seq"].shape == out_w["seq"].shape
    assert int(jnp.max(out_c["seq"])) < VOCAB
    # encoder features agree to f16 rounding
    enc_w = model.apply(params, batch, method="encode")
    enc_c = model.apply(params, compact, method="encode")
    np.testing.assert_allclose(np.asarray(enc_c["feat_diff"]),
                               np.asarray(enc_w["feat_diff"]),
                               rtol=5e-3, atol=5e-3)


def test_train_hoist_matches_plain_scan():
    """speaker.train_hoist (input-side matmuls hoisted out of the
    teacher-forcing scan) must match the plain path: same params, same
    dropout keys -> same masks; only matmul summation order differs
    (fused@w_ih[:E] + h@w_ih[E:] vs concat@w_ih), so f32 allclose."""
    cfg = tiny_config()
    cfg_h = cfg.replace(speaker=cfg.speaker.replace(train_hoist=True))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 3, seed=5))
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    model_h = EkaidModel(cfg_h, ntoken=NTOKEN, policy=F32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)

    def loss_fn(m):
        def f(p, b, train):
            out = m.apply(p, b, train=train,
                          rngs={"dropout": jax.random.PRNGKey(2)}
                          if train else None)
            return total_loss(out, b, cfg.train.att_reg_weight)[0]
        return f

    # eval-mode (dropout off)
    l0, g0 = jax.value_and_grad(loss_fn(model))(params, batch, False)
    l1, g1 = jax.value_and_grad(loss_fn(model_h))(params, batch, False)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-6)

    # train-mode: identical dropout key schedule -> same masks
    l0t, g0t = jax.value_and_grad(loss_fn(model))(params, batch, True)
    l1t, g1t = jax.value_and_grad(loss_fn(model_h))(params, batch, True)
    np.testing.assert_allclose(float(l1t), float(l0t), rtol=1e-6)
    for x, y in zip(jax.tree.leaves(g0t), jax.tree.leaves(g1t)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-6)

    # scheduled sampling forces the plain path (inputs become
    # output-dependent): must still run and stay finite
    out = model_h.apply(params, batch, train=True, ss_prob=0.5,
                        rngs={"dropout": jax.random.PRNGKey(2),
                              "sample": jax.random.PRNGKey(3)})
    l_ss = total_loss(out, batch, cfg.train.att_reg_weight)[0]
    assert np.isfinite(float(l_ss))


def test_length_bucket_selection():
    from ekaid_tpu.data.pipeline import trim_batch_to_bucket

    def fake(maxlen, t=12):
        masks = np.zeros((2, t + 1), np.float32)
        masks[0, :3] = 1.0                    # 1-token row
        masks[1, :maxlen + 2] = 1.0           # maxlen-token row
        return {"labels": np.ones((2, t + 1), np.int64),
                "pos": np.ones((2, t + 1), np.int64), "masks": masks}

    # smallest covering bucket wins
    out = trim_batch_to_bucket(fake(3), (4, 8), 12)
    assert out["labels"].shape[1] == 5
    out = trim_batch_to_bucket(fake(5), (4, 8), 12)
    assert out["labels"].shape[1] == 9
    # nothing covers -> full length untouched
    out = trim_batch_to_bucket(fake(10), (4, 8), 12)
    assert out["labels"].shape[1] == 13
    # no buckets -> no-op
    out = trim_batch_to_bucket(fake(3), (), 12)
    assert out["labels"].shape[1] == 13
    # buckets >= seq_length are ignored (full program is the fallback)
    out = trim_batch_to_bucket(fake(3), (12, 20), 12)
    assert out["labels"].shape[1] == 13


def test_greedy_decode_batch_size_invariant(setup):
    """Greedy decode is per-sample independent: decoding 6 samples in
    one batch must produce token-identical sequences to decoding them
    as 3+3 (and 6×1). This is what makes the eval driver's decode batch
    a pure throughput knob (`ekaid-test --batch_size`; the reference
    pins eval batch 64, configs/config.py:123 — on the v5e, batch 128
    measures 1.4× the pairs/s of 64)."""
    cfg, model, _, params = setup
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 6, seed=13))

    def decode(b):
        return np.asarray(model.apply(params, b, method="decode",
                                      sample_max=True)["seq"])

    full = decode(batch)

    def rows(lo, hi):
        return jax.tree.map(lambda x: x[lo:hi], batch)

    halves = np.concatenate([decode(rows(0, 3)), decode(rows(3, 6))])
    np.testing.assert_array_equal(full, halves)
    singles = np.concatenate([decode(rows(i, i + 1)) for i in range(6)])
    np.testing.assert_array_equal(full, singles)


def test_pair_batch_matches_two_pass():
    """change_detector.pair_batch (bef/aft stacked into one [2B, ...]
    encoder pass — the reference runs the shared-weight stack once per
    image, modules.py:216-232) must be bit-identical in eval mode:
    per-sample math is batch-row independent. Same param tree either
    way; train mode differs only in the dropout draw, so check
    finiteness + identical loss under dropout-off train semantics."""
    cfg = tiny_config()
    cfg_p = cfg.replace(change_detector=cfg.change_detector.replace(
        pair_batch=True))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 3, seed=7))
    model = EkaidModel(cfg, ntoken=NTOKEN, policy=F32)
    model_p = EkaidModel(cfg_p, ntoken=NTOKEN, policy=F32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    # identical parameter trees: the knob must not change the checkpoint
    params_p = model_p.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_p)):
        assert a.shape == b.shape

    o0 = model.apply(params, batch, train=False)
    o1 = model_p.apply(params, batch, train=False)
    for k in ("logprobs", "pred", "att_bef", "att_aft", "feat_diff",
              "module_weights"):
        np.testing.assert_array_equal(np.asarray(o0[k]), np.asarray(o1[k]),
                                      err_msg=k)

    # gradients agree in eval-dropout mode (the knob only reorders the
    # batch axis; backward is row-independent too)
    def loss_fn(m):
        return lambda p: total_loss(
            m.apply(p, batch, train=False),
            batch, cfg.train.att_reg_weight)[0]
    l0, g0 = jax.value_and_grad(loss_fn(model))(params)
    l1, g1 = jax.value_and_grad(loss_fn(model_p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-7)
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-7)

    # train mode (real dropout): runs and stays finite
    out = model_p.apply(params, batch, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(total_loss(
        out, batch, cfg.train.att_reg_weight)[0]))


def test_pair_batch_train_mode_splits_by_phase():
    """pair_batch='train' folds the [2B] pass under train=True only:
    eval output must be bit-identical to 'off' (two-pass), while the
    train forward matches pair_batch='on' under the same dropout key
    (both draw the [2B]-shaped masks)."""
    cfg = tiny_config()
    mk = lambda pb: EkaidModel(  # noqa: E731
        cfg.replace(change_detector=cfg.change_detector.replace(
            pair_batch=pb)), ntoken=NTOKEN, policy=F32)
    m_off, m_tr, m_on = mk("off"), mk("train"), mk("on")
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 3, seed=11))
    params = m_off.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)

    # eval: 'train' == 'off' exactly
    o_off = m_off.apply(params, batch, train=False)
    o_tr = m_tr.apply(params, batch, train=False)
    for k in ("logprobs", "pred", "feat_diff"):
        np.testing.assert_array_equal(np.asarray(o_off[k]),
                                      np.asarray(o_tr[k]), err_msg=k)

    # train: 'train' == 'on' exactly (same rng => same [2B] mask draw)
    rngs = {"dropout": jax.random.PRNGKey(2), "sample": jax.random.PRNGKey(3)}
    t_tr = m_tr.apply(params, batch, train=True, rngs=rngs)
    t_on = m_on.apply(params, batch, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(t_tr["logprobs"]),
                                  np.asarray(t_on["logprobs"]))
