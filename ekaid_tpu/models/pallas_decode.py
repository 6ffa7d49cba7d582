"""Monolithic Pallas greedy-decode kernel: the whole answer loop on-chip.

Re-designs the reference's per-token Python sampling loop
(dynamic_speaker_change_pos.py:287-357) one level further than the XLA
lax.while_loop in decoder.py::sample. Measured on the v5e, the XLA
decode runs at ~2.1-2.7x its pure-MXU compute time at every batch size
(b64 63 us/step vs ~23 us of matmul; scripts/bench_decode_sweep.py),
and the per-step weight traffic is already VMEM-resident (XLA pins all
~29.4 MB of decode weights in S(1) copies — see STATUS round-3 item 4),
so the remaining gap is *serial per-op scheduling latency* inside each
scan step: ~15 small dependent HLO ops whose pipeline bubbles cannot be
hidden because step t+1 depends on step t's argmax.

This kernel runs ALL T decode steps inside ONE pallas_call: every
weight is loaded into VMEM once, the (h, c) states and the token live
in registers/VMEM for the whole loop, and the early-exit
(`all sequences finished`) is a lax.while_loop in-kernel. Per step it
executes the same math as DynamicCore + _out_logprobs, in the same
order (two-dot LSTM cells, f32 softmaxes, one-hot-matmul embedding
lookup — exact for one-hot operands), so outputs match the XLA path
(exactly at f32; tested in tests/test_pallas_decode.py).

Inference-only (greedy sample_max, no dropout, no VJP) — the eval/
serving path. `speaker.decode_kernel='pallas'` opts in; teacher forcing
and beam search keep the XLA paths. Weights stay in VMEM: ~29.4 MB bf16
at flagship dims (R=512, E=1024, D=1024, W=300, V=148), under the
raised 120 MB scoped-vmem limit (v5e VMEM is 128 MB/core; the f32
exactness-gate variant measured 112.6 MB of kernel stack on-chip).
Hardware Mosaic constraints found in the r4 bring-up (interpret mode
models neither): matmul accumulators must be 32-bit (see `mm`), and
the 112 MB default scoped-VMEM limit is too small for f32 weights.

Kernel-layout notes (same lessons as ops/pallas_roi.py): everything is
kept 2-D with batch on sublanes; outputs are written row-per-step as
[T, B] (sublane-dim dynamic stores at lane offset 0 — the ONLY dynamic
store shape hardware Mosaic accepted in the r4 bring-up: static column
offsets k*B and even 128-aligned offsets with partial width are
'dynamic store with unaligned indices'); module weights therefore use
three separate [T, B] refs (a [T,B,3] ref would also lane-pad 43x);
tpu iota must be >=2-D (broadcasted_iota).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ekaid_tpu.utils.dtypes import Policy


def _gates(z, c_prev):
    """LSTMCell gate math — single shared copy (decoder._lstm_gates).

    Computed in f32 regardless of the compute dtype: hardware Mosaic
    rejects the mixed-type scalar broadcast inside sigmoid on bf16
    vectors ('vector.broadcast op ... same element type', r4d run),
    and f32 gate nonlinearities only add precision."""
    from ekaid_tpu.models.decoder import _lstm_gates
    dt = z.dtype
    h, c = _lstm_gates(z.astype(jnp.float32),
                       c_prev.astype(jnp.float32), cast=lambda x: x)
    return h.astype(dt), c.astype(dt)


def _decode_kernel(cfg, policy, n_weights,
                   # refs: [bos, fused, feats] + weights + outputs
                   *refs):
    (bos_ref, fused_ref, feats_ref), w = refs[:3], refs[3:3 + n_weights]
    seq_ref, lps_ref, mw0_ref, mw1_ref, mw2_ref = refs[3 + n_weights:]
    mw_refs = (mw0_ref, mw1_ref, mw2_ref)
    (wemb, wih_mod, whh_mod, b_mod, wfc, bfc, wpos1, bpos1, wwp, bwp,
     wpos2, bpos2, wg1, bg1, wg2, bg2, wih_lang_x, wih_lang_a,
     whh_lang, b_lang, wlogit, blogit) = [r[:] for r in w]

    B = fused_ref.shape[0]
    T = seq_ref.shape[0]
    D = cfg.input_dim
    V = cfg.vocab_size
    R = cfg.rnn_size
    dt = policy.compute_dtype
    st = policy.softmax_dtype

    def mm(a, b):
        # Mosaic on hardware requires 32-bit matmul accumulators
        # ('tpu.matmul op Expected matmul acc to be 32-bit' — interpret
        # mode does not model this); accumulate f32 then round once,
        # which is exactly XLA's bf16-out dot semantics
        return jnp.dot(a, b,
                       preferred_element_type=jnp.float32).astype(dt)

    seq_ref[:] = jnp.zeros_like(seq_ref)
    lps_ref[:] = jnp.zeros_like(lps_ref)
    for r in mw_refs:
        r[:] = jnp.zeros_like(r)

    fused = fused_ref[:]
    feats = feats_ref[:]                              # [B, 3*D]
    f_bef, f_dif, f_aft = feats[:, :D], feats[:, D:2 * D], feats[:, 2 * D:]
    lanes_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    neg_inf = jnp.asarray(-jnp.inf, st)
    zeros_r = jnp.zeros((B, R), dt)

    def step(carry):
        t, it, unfin, h_mod, c_mod, h_lang, c_lang = carry
        # ---- embedding lookup as one-hot matmul (exact) + ReLU ------
        onehot = (lanes_v == it.T).astype(dt)         # it [1,B] -> [B,1]
        xt = jax.nn.relu(mm(onehot, wemb))
        # ---- module-attention LSTM ----------------------------------
        z_mod = (mm(jnp.concatenate([fused, h_lang], -1), wih_mod)
                 + mm(h_mod, whh_mod)
                 + b_mod)
        h_mod, c_mod = _gates(z_mod, c_mod)
        mw = jax.nn.softmax(
            (mm(h_mod, wfc)
             + bfc).astype(st), axis=-1)              # [B, 3] f32
        # ---- POS head ------------------------------------------------
        vpos = jax.nn.relu(mm(h_lang, wpos1) + bpos1)
        dpos = mm(vpos, wwp) + bwp
        ppos = (mm(jax.nn.softmax(dpos.astype(st), -1).astype(dt),
                   wpos2) + bpos2)
        # ---- gated module fusion ------------------------------------
        mw_c = mw.astype(dt)
        att = (mw_c[:, 0:1] * f_bef + mw_c[:, 1:2] * f_dif
               + mw_c[:, 2:3] * f_aft)
        gate_h = jax.nn.relu(
            mm(jnp.concatenate([h_lang, ppos, att], -1), wg1) + bg1)
        # sigmoid in f32: Mosaic's logistic lowering broadcasts an f32
        # scalar, which its verifier rejects into bf16 vectors (same
        # constraint as _gates)
        gate = jax.nn.sigmoid(
            (mm(gate_h, wg2) + bg2).astype(jnp.float32)).astype(dt)
        # ---- language LSTM (w_ih split on host: a [xt | gate*att]
        # lane-concat at offset 300 is not 128-aligned for Mosaic) ----
        z_lang = (mm(xt, wih_lang_x)
                  + mm(gate * att, wih_lang_a)
                  + mm(h_lang, whh_lang)
                  + b_lang)
        h_lang, c_lang = _gates(z_lang, c_lang)
        # ---- logits -> greedy token ---------------------------------
        logits = (mm(h_lang, wlogit)
                  + blogit).astype(st)
        m = jnp.max(logits, -1, keepdims=True)
        logp = logits - (m + jnp.log(jnp.sum(jnp.exp(logits - m), -1,
                                             keepdims=True)))
        logp = jnp.where((t == 0) & (lanes_v == 0), neg_inf, logp)
        if cfg.decoding_constraint:
            logp = jnp.where((lanes_v == it.T) & (t > 0), neg_inf, logp)
        # keep intermediates 2-D for Mosaic (no 1-D squeezes)
        nxt = jnp.transpose(jnp.argmax(logp, -1, keepdims=True)
                            .astype(jnp.int32))               # [1, B]
        lp = jnp.transpose(jnp.max(logp, -1, keepdims=True))  # [1, B]
        unfin = unfin * (nxt > 0).astype(unfin.dtype)
        nxt = nxt * unfin
        # ---- write step outputs (sublane-dim dynamic row) -----------
        seq_ref[pl.ds(t, 1), :] = nxt
        lps_ref[pl.ds(t, 1), :] = lp.astype(lps_ref.dtype)
        live = (nxt > 0).astype(mw0_ref.dtype)        # [1, B]
        # one [T, B] ref per module, full-row stores at lane offset 0:
        # hardware Mosaic rejects dynamic stores at non-zero lane
        # offsets in this shape regime ('dynamic store with unaligned
        # indices' at k*B and even at 128-aligned k*BL with partial
        # width, r4 bring-up); the seq/lps row-store pattern is the one
        # that verifiably compiles. Interpret mode models none of this.
        for k in range(3):
            mw_refs[k][pl.ds(t, 1), :] = \
                jnp.transpose(mw[:, k:k + 1]).astype(mw0_ref.dtype) * live
        return t + 1, nxt, unfin, h_mod, c_mod, h_lang, c_lang

    def cond(carry):
        t, _, unfin = carry[0], carry[1], carry[2]
        return (t < T) & (jnp.sum(unfin) > 0)

    it0 = bos_ref[:].astype(jnp.int32)                # [1, B]
    jax.lax.while_loop(
        cond, step,
        (jnp.int32(0), it0, jnp.ones((1, B), jnp.int32),
         zeros_r, zeros_r, zeros_r, zeros_r))


def pallas_greedy_decode(speaker_params, cfg, policy: Policy,
                         fused, feats, interpret: bool = False,
                         mesh=None, data_axis: str = "data"
                         ) -> Dict[str, jnp.ndarray]:
    """Run the whole greedy decode in one kernel.

    speaker_params: DynamicSpeaker variables['params'] (word_emb, core,
    logit; 'embed' is consumed by the caller's _fused). fused [B, E],
    feats [B, 3, D] as produced by DynamicSpeaker._fused.

    mesh: a jax.sharding.Mesh ⇒ run the kernel under `jax.shard_map`
    over `data_axis` (VERDICT r4 #4: pallas_call has no GSPMD
    partitioning rule, so without this the sharded eval jit silently
    kept the XLA loop). The kernel is batch-parallel — each device
    decodes its own batch shard with zero cross-chip communication,
    and per-shard early exit can only fire sooner than the global one.
    Weights enter replicated (P()); if the eval params arrive
    model-sharded, GSPMD inserts the one-time all-gather at kernel
    entry. A 1-sized (or absent) data axis falls through to the plain
    call — bit-identical, no shard_map overhead.

    Returns the same dict as DynamicSpeaker.sample(sample_max=True):
    seq [B, T] int32, logprobs [B, T] f32, module_weights [B, T, 3]
    (rows zeroed past EOS).
    """
    c = cfg
    core = speaker_params["core"]
    cast = policy.cast_compute
    B = fused.shape[0]
    T = c.seq_length
    # biases reshaped to [1, N]: Mosaic wants >=2-D VMEM operands
    def w2(x):
        x = cast(x)
        return x.reshape(1, -1) if x.ndim == 1 else x

    weights = [w2(x) for x in (
        speaker_params["word_emb"],
        core["module_att_lstm"]["w_ih"], core["module_att_lstm"]["w_hh"],
        core["module_att_lstm"]["b"],
        core["weight_fc"]["kernel"], core["weight_fc"]["bias"],
        core["pos1"]["kernel"], core["pos1"]["bias"],
        core["weight_pos"]["kernel"], core["weight_pos"]["bias"],
        core["pos2"]["kernel"], core["pos2"]["bias"],
        core["gate1x"]["kernel"], core["gate1x"]["bias"],
        core["gate2x"]["kernel"], core["gate2x"]["bias"],
        # lang w_ih split at the word-embedding boundary (see kernel)
        core["lang_lstm"]["w_ih"][:c.word_embed_size],
        core["lang_lstm"]["w_ih"][c.word_embed_size:],
        core["lang_lstm"]["w_hh"], core["lang_lstm"]["b"],
        speaker_params["logit"]["kernel"], speaker_params["logit"]["bias"],
    )]
    bos = jnp.full((1, B), c.bos_token, jnp.int32)
    feats2d = cast(feats.reshape(B, -1))              # [B, 3*D]

    # 120 MB scoped VMEM: the f32 exactness-gate variant (f32 weights
    # ~59 MB + scratch) measured 112.60 MB of stack on-chip — 612 KB
    # over the previous 112 MB limit (r4b decode_pallas stderr); bf16
    # needs far less. v5e VMEM is 128 MB/core.
    kw = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2**20)}

    def call(bos_x, fused_x, feats_x, *ws):
        b = fused_x.shape[0]
        return pl.pallas_call(
            partial(_decode_kernel, c, policy, len(ws)),
            out_shape=[
                jax.ShapeDtypeStruct((T, b), jnp.int32),
                jax.ShapeDtypeStruct((T, b), jnp.float32),
                jax.ShapeDtypeStruct((T, b), jnp.float32),
                jax.ShapeDtypeStruct((T, b), jnp.float32),
                jax.ShapeDtypeStruct((T, b), jnp.float32),
            ],
            interpret=interpret,
            **kw,
        )(bos_x, fused_x, feats_x, *ws)

    n_data = (mesh.shape.get(data_axis, 1) if mesh is not None else 1)
    if n_data > 1:
        from jax.sharding import PartitionSpec as P
        assert B % n_data == 0, (
            f"pallas decode batch {B} not divisible by the mesh "
            f"'{data_axis}' axis ({n_data})")
        rep = P()
        call = jax.shard_map(
            call, mesh=mesh,
            in_specs=(P(None, data_axis), P(data_axis), P(data_axis),
                      *([rep] * len(weights))),
            out_specs=(P(None, data_axis),) * 5,
            # outputs vary per shard along the batch lanes; the kernel
            # itself is opaque to the replication checker
            check_vma=False)
    seq_t, lps_t, mw0, mw1, mw2 = call(bos, cast(fused), feats2d,
                                       *weights)

    seq = seq_t.T                                     # [B, T]
    lps = lps_t.T
    mws = jnp.stack([mw0.T, mw1.T, mw2.T], -1)        # [B, T, 3]
    return {"seq": seq, "logprobs": lps, "module_weights": mws}
