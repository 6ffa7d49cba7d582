"""Answer decoder: two-layer LSTM speaker as a single `lax.scan`.

Parity target: model/models/dynamic_speaker_change_pos.py —
  * DynamicCore (:42-131): module-attention LSTM producing 3-way softmax
    weights over (bef, diff, aft); POS head pos1/weight_pos/pos2 (16
    classes, :65-76,106-110); gated fused feature + word embedding into
    the language LSTM.
  * DynamicSpeaker (:139-357): teacher-forced `_forward` with scheduled
    sampling (:182-222), greedy/multinomial `_sample` (:287-357) with
    first-step NULL suppression, optional no-repeat constraint, and the
    unfinished-mask early stop. The reference's per-token Python loop
    (SURVEY.md §3.1 "HOT: Python-level step loop") becomes one scan whose
    carried state is the two (h, c) pairs; the (bef, diff, aft) fusion
    embedding is loop-invariant and hoisted out of the scan entirely.

  The reference primes free-running decode with token index 2
  (:272,311) although the shipped vocab maps '<start>'→1; `bos_token`
  preserves that. Training consumes seq[:, 0] == '<start>' (=1).

  The reference resamples dropout masks at every timestep (each
  `nn.Dropout` call in the Python loop); per-step rng keys are threaded
  through the scan as inputs to reproduce that, since `make_rng` inside a
  traced scan body would freeze one mask for all steps.

  The POS log-probs are returned for API parity but — exactly as in the
  reference (train_mimic.py:235-247) — never enter the loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.layers import (DenseT, LSTMCell,
                                     embedding_init_normal)
from ekaid_tpu.models.layers import dropout as _drop
from ekaid_tpu.utils.dtypes import Policy, F32


class DynamicCore(nn.Module):
    """One decode step (DynamicCore.forward, :94-131)."""

    cfg: Any                      # SpeakerConfig
    policy: Policy = F32

    @nn.compact
    def __call__(self, xt, fused_embed, feats, state,
                 drop_key: Optional[jax.Array] = None,
                 mod_pre=None, lang_xt_pre=None):
        """
        xt:          [B, word_embed_size] current word embedding
        fused_embed: [B, embed_dim] — self.embed(cat[bef, diff, aft]),
                     loop-invariant, computed once by the speaker
        feats:       [B, 3, input_dim] stacked (bef, diff, aft)
        state:       dict h_mod/c_mod/h_lang/c_lang each [B, rnn_size]
        drop_key:    per-step dropout key (None = eval)
        mod_pre:     optional [B, 4R] = fused_embed @ mod.w_ih[:E],
                     hoisted out of the scan by teacher_forcing
                     (loop-invariant; speaker.train_hoist)
        lang_xt_pre: optional [B, 4R] = xt @ lang.w_ih[:W], precomputed
                     for all steps in one matmul under teacher forcing
                     (xt is then ignored and may be None)
        """
        c = self.cfg
        cast = self.policy.cast_compute
        keys = (jax.random.split(drop_key, 3)
                if drop_key is not None else [None] * 3)

        prev_h = state["h_lang"]
        if mod_pre is None:
            mod_x, mod_kw = (jnp.concatenate([fused_embed, prev_h],
                                             axis=-1), {})
        else:
            mod_x = prev_h
            mod_kw = {"pre": mod_pre, "pre_width": c.embed_dim}
        h_mod, c_mod = LSTMCell(c.rnn_size, policy=self.policy,
                                name="module_att_lstm")(
            mod_x, state["h_mod"], state["c_mod"], **mod_kw)
        module_weights = jax.nn.softmax(self.policy.cast_softmax(
            DenseT(3, policy=self.policy, name="weight_fc")(h_mod)), axis=-1)

        # POS head (:106-110)
        vpos = _drop(nn.relu(DenseT(c.rnn_size, policy=self.policy,
                                    name="pos1")(prev_h)),
                     c.drop_prob_lm, keys[0])
        dpos = _drop(DenseT(c.pos_classes, policy=self.policy,
                            name="weight_pos")(vpos), 0.5, keys[1])
        ppos = DenseT(c.rnn_size, policy=self.policy, name="pos2")(
            cast(jax.nn.softmax(self.policy.cast_softmax(dpos), axis=-1)))

        att_feat = jnp.einsum("bk,bkd->bd", cast(module_weights),
                              cast(feats),
                              preferred_element_type=self.policy.compute_dtype)

        gate_in = jnp.concatenate([prev_h, ppos, att_feat], axis=-1)
        gate_h = _drop(nn.relu(DenseT(gate_in.shape[-1], policy=self.policy,
                                      name="gate1x")(gate_in)),
                       c.drop_prob_lm, keys[2])
        gate = nn.sigmoid(DenseT(c.input_dim, policy=self.policy,
                                 name="gate2x")(gate_h))

        if lang_xt_pre is None:
            lang_x, lang_kw = (jnp.concatenate([xt, gate * att_feat],
                                               axis=-1), {})
        else:
            lang_x = gate * att_feat
            lang_kw = {"pre": lang_xt_pre,
                       "pre_width": c.word_embed_size}
        h_lang, c_lang = LSTMCell(c.rnn_size, policy=self.policy,
                                  name="lang_lstm")(
            lang_x, state["h_lang"], state["c_lang"], **lang_kw)

        new_state = {"h_mod": h_mod, "c_mod": c_mod,
                     "h_lang": h_lang, "c_lang": c_lang}
        return h_lang, new_state, dpos, module_weights


def _lstm_gates(z, c_prev, cast):
    """(i, f, g, o) gate math shared with layers.LSTMCell."""
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c = nn.sigmoid(f) * cast(c_prev) + nn.sigmoid(i) * jnp.tanh(g)
    h = nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def make_fused_core_step(core_params, cfg, policy: Policy):
    """Merged-matmul eval step over DynamicCore's existing params.

    Builds one [E+2R+W, 4R+R+4R] weight K1 from (module_att_lstm.w_ih/
    w_hh, pos1.kernel, lang_lstm.w_ih[:W]/w_hh) with zero blocks where an
    input doesn't feed an output, so the 5 independent step-start
    matmuls become one wide MXU dispatch; a second block-diagonal merge
    covers weight_fc+weight_pos. Zero-block FLOPs are wasted but the
    decode is dispatch/latency-bound, not FLOP-bound (speaker.fused_core
    knob; A/B'd in bench.py). Same parameters, same math up to f32
    summation order.
    """
    p = jax.tree.map(policy.cast_compute, core_params)
    mod, lang = p["module_att_lstm"], p["lang_lstm"]
    E = mod["w_ih"].shape[0] - lang["w_hh"].shape[0]  # embed_dim
    R = lang["w_hh"].shape[0]                         # rnn_size
    W = lang["w_ih"].shape[0] - cfg.input_dim         # word_embed_size
    FourR = 4 * R
    z = jnp.zeros
    dt = policy.compute_dtype
    # rows: [fused(E), h_lang(R), h_mod(R), xt(W)]
    k1 = jnp.concatenate([
        jnp.concatenate([mod["w_ih"][:E], z((E, R), dt),
                         z((E, FourR), dt)], 1),
        jnp.concatenate([mod["w_ih"][E:], p["pos1"]["kernel"],
                         lang["w_hh"]], 1),
        jnp.concatenate([mod["w_hh"], z((R, R), dt),
                         z((R, FourR), dt)], 1),
        jnp.concatenate([z((W, FourR), dt), z((W, R), dt),
                         lang["w_ih"][:W]], 1),
    ], 0)
    b1 = jnp.concatenate([mod["b"], p["pos1"]["bias"], lang["b"]])
    k2 = jnp.concatenate([
        jnp.concatenate([p["weight_fc"]["kernel"],
                         z((R, cfg.pos_classes), dt)], 1),
        jnp.concatenate([z((R, 3), dt), p["weight_pos"]["kernel"]], 1),
    ], 0)
    b2 = jnp.concatenate([p["weight_fc"]["bias"],
                          p["weight_pos"]["bias"]])
    cast = policy.cast_compute

    def step(xt, fused, feats, state):
        a = jnp.concatenate([fused, state["h_lang"], state["h_mod"],
                             cast(xt)], -1)
        z1 = jnp.dot(a, k1, preferred_element_type=dt) + b1
        h_mod, c_mod = _lstm_gates(z1[:, :FourR], state["c_mod"], cast)
        vpos = nn.relu(z1[:, FourR:FourR + R])
        z_lang_part = z1[:, FourR + R:]

        z2 = jnp.dot(jnp.concatenate([h_mod, vpos], -1), k2,
                     preferred_element_type=dt) + b2
        module_weights = jax.nn.softmax(
            policy.cast_softmax(z2[:, :3]), axis=-1)
        dpos = z2[:, 3:]
        ppos = (jnp.dot(cast(jax.nn.softmax(policy.cast_softmax(dpos),
                                            axis=-1)),
                        p["pos2"]["kernel"], preferred_element_type=dt)
                + p["pos2"]["bias"])
        att_feat = jnp.einsum("bk,bkd->bd", cast(module_weights),
                              feats, preferred_element_type=dt)
        gate_in = jnp.concatenate([state["h_lang"], ppos, att_feat], -1)
        gate_h = nn.relu(jnp.dot(gate_in, p["gate1x"]["kernel"],
                                 preferred_element_type=dt)
                         + p["gate1x"]["bias"])
        gate = nn.sigmoid(jnp.dot(gate_h, p["gate2x"]["kernel"],
                                  preferred_element_type=dt)
                          + p["gate2x"]["bias"])
        z_lang = z_lang_part + jnp.dot(gate * att_feat,
                                       lang["w_ih"][W:],
                                       preferred_element_type=dt)
        h_lang, c_lang = _lstm_gates(z_lang, state["c_lang"], cast)
        new_state = {"h_mod": h_mod, "c_mod": c_mod,
                     "h_lang": h_lang, "c_lang": c_lang}
        return h_lang, new_state, dpos, module_weights

    return step


class DynamicSpeaker(nn.Module):
    """Scan-based speaker (DynamicSpeaker parity)."""

    cfg: Any                      # SpeakerConfig
    policy: Policy = F32
    # jax.sharding.Mesh for the pallas decode kernel under multi-chip
    # eval (shard_map over 'data' — see pallas_decode.pallas_greedy_
    # decode). None (default) = single-device pallas_call. Static
    # module metadata, not a traced value.
    decode_mesh: Any = None

    def setup(self):
        c = self.cfg
        self.word_emb = self.param(
            "word_emb", embedding_init_normal(),
            (c.vocab_size, c.word_embed_size), self.policy.param_dtype)
        self.fuse_embed = DenseT(c.embed_dim, policy=self.policy,
                                 name="embed")
        self.core = DynamicCore(c, policy=self.policy, name="core")
        self.logit = DenseT(c.vocab_size, policy=self.policy, name="logit")

    # ---------------------------------------------------------- helpers ---

    def _embed_word(self, it, key: Optional[jax.Array]):
        """self.embed Sequential(Embedding → ReLU → Dropout) (:153-156)."""
        x = nn.relu(self.policy.cast_compute(self.word_emb[it]))
        return _drop(x, self.cfg.drop_prob_lm, key)

    def _fused(self, feat_bef, feat_diff, feat_aft,
               key: Optional[jax.Array]):
        cast = self.policy.cast_compute
        embed_in = jnp.concatenate(
            [cast(feat_bef), cast(feat_diff), cast(feat_aft)], axis=-1)
        fused = _drop(nn.relu(self.fuse_embed(embed_in)),
                      self.cfg.drop_prob_lm, key)
        feats = jnp.stack([cast(feat_bef), cast(feat_diff), cast(feat_aft)],
                          axis=1)
        return fused, feats

    def _init_state(self, batch: int):
        z = jnp.zeros((batch, self.cfg.rnn_size), self.policy.compute_dtype)
        return {"h_mod": z, "c_mod": z, "h_lang": z, "c_lang": z}

    def _out_logprobs(self, h_lang, dpos, key: Optional[jax.Array]):
        output = _drop(h_lang, self.cfg.drop_prob_lm, key)
        logp = jax.nn.log_softmax(
            self.policy.cast_softmax(self.logit(output)), axis=-1)
        logp_pos = jax.nn.log_softmax(
            self.policy.cast_softmax(dpos), axis=-1)
        return logp, logp_pos

    # ------------------------------------------------------------ modes ---

    def teacher_forcing(self, feat_bef, feat_aft, feat_diff, seq,
                        ss_prob: float = 0.0,
                        train: bool = False) -> Dict[str, jnp.ndarray]:
        """_forward parity (:182-222): teacher-forced log-probs.

        seq: [B, T+1] int (seq[:, 0] == <start>); returns logprobs
        [B, T, vocab] aligned so step i predicts seq[:, i+1].
        Scheduled sampling replaces the input token with a sample from the
        previous step's distribution with prob `ss_prob` (i >= 1).

        The scan length follows seq's time axis (normally
        cfg.seq_length; shorter when the train driver's length
        bucketing trims the batch — trim_batch_to_bucket): under the
        loss mask the trailing all-padded steps contribute exactly
        zero, so a trimmed scan is loss- and grad-identical while
        skipping their serial compute. TPU-first optimization; the
        reference always runs the full 90 steps
        (dynamic_speaker_change_pos.py:196).
        """
        c = self.cfg
        B, T = feat_bef.shape[0], seq.shape[1] - 1
        use_ss = train and ss_prob > 0.0

        if train:
            rng = self.make_rng("dropout")
            fuse_key, step_rng = jax.random.split(rng)
            step_keys = jax.random.split(step_rng, (T, 3))
        else:
            fuse_key = None
            step_keys = jnp.zeros((T,), jnp.int32)       # dummy scan input
        if use_ss:
            ss_keys = jax.random.split(self.make_rng("sample"), (T, 2))
        else:
            ss_keys = jnp.zeros((T,), jnp.int32)

        fused, feats = self._fused(feat_bef, feat_diff, feat_aft, fuse_key)
        state0 = self._init_state(B)
        tokens = jnp.swapaxes(seq[:, :T], 0, 1)          # [T, B]

        # TPU-first scan-hoist (speaker.train_hoist, DOCUMENTED
        # DEVIATION: summation order only): under teacher forcing
        # every input token is known upfront and the fused embedding is
        # loop-invariant, so (a) fused @ mod.w_ih[:E] is computed ONCE
        # instead of per step, and (b) all T word embeddings + their
        # lang.w_ih[:W] projections run as ONE [T·B] matmul outside the
        # scan. This removes two of the serial per-step matmuls AND
        # drops their weight-grad accumulators (~10.6 MB) from the
        # 90-step backward carry — the train step is scan-serial-
        # latency/HBM-bound (STATUS r3 item 5). Scheduled sampling
        # makes inputs output-dependent, so SS batches keep the plain
        # path. The reference recomputes everything per Python-loop
        # step (dynamic_speaker_change_pos.py:196-222).
        hoist = (getattr(c, "train_hoist", False) and not use_ss
                 and not self.is_mutable_collection("params"))
        if hoist:
            cast = self.policy.cast_compute
            cp = self.core.variables["params"]
            dt = self.policy.compute_dtype
            mod_pre = jnp.dot(
                fused, cast(cp["module_att_lstm"]["w_ih"])[:c.embed_dim],
                preferred_element_type=dt)
            emb = nn.relu(cast(self.word_emb[tokens]))   # [T, B, W]
            if train:
                emb = jax.vmap(
                    lambda x, kk: _drop(x, c.drop_prob_lm, kk[0])
                )(emb, step_keys)
            lang_pre = jnp.dot(
                emb, cast(cp["lang_lstm"]["w_ih"])[:c.word_embed_size],
                preferred_element_type=dt)               # [T, B, 4R]
        else:
            # hoist off: NO dummy scan input — the traced program must
            # stay byte-identical to the pre-hoist trace so the
            # persistent compile cache (incl. the driver's 13-min
            # seq-90 dryrun program) still hits
            lang_pre = None
            mod_pre = None

        def step(carry, inp):
            state, prev_logp = carry
            if hoist:
                it, kk, ssk, i, lpre = inp
            else:
                it, kk, ssk, i = inp
                lpre = None
            if use_ss:
                sample = jax.random.categorical(ssk[0], prev_logp,
                                                axis=-1).astype(it.dtype)
                coin = jax.random.uniform(ssk[1], (B,))
                it = jnp.where((coin < ss_prob) & (i >= 1), sample, it)
            k = [kk[j] for j in range(3)] if train else [None] * 3
            if hoist:
                h_lang, state, dpos, mw = self.core(
                    None, fused, feats, state, drop_key=k[1],
                    mod_pre=mod_pre, lang_xt_pre=lpre)
            else:
                xt = self._embed_word(it, k[0])
                h_lang, state, dpos, mw = self.core(xt, fused, feats,
                                                    state, drop_key=k[1])
            logp, logp_pos = self._out_logprobs(h_lang, dpos, k[2])
            return (state, logp), (logp, logp_pos, mw)

        prev_logp0 = jnp.zeros((B, c.vocab_size), self.policy.softmax_dtype)
        idx = jnp.arange(T)
        xs = (tokens, step_keys, ss_keys, idx)
        if hoist:
            xs = xs + (lang_pre,)

        if self.is_mutable_collection("params"):
            # init trace: one eager step materializes every parameter
            (_, _), (logp, logp_pos, mw) = step(
                (state0, prev_logp0),
                tuple(x[0] for x in xs))
            logps = jnp.broadcast_to(logp[:, None], (B, T) + logp.shape[1:])
            logps_pos = jnp.broadcast_to(logp_pos[:, None],
                                         (B, T) + logp_pos.shape[1:])
            mws = jnp.broadcast_to(mw[:, None], (B, T, 3))
        else:
            scan_step = step
            if train and c.remat != "none":
                # remat the scan body for the backward: store only the
                # carried state between steps, recompute ('full') or
                # keep matmul outputs ('dots') within a step. Applied
                # ONLY on the scan path — the init trace's eager step
                # must create params outside jax.checkpoint.
                pol = (None if c.remat == "full"
                       else jax.checkpoint_policies.checkpoint_dots)
                scan_step = jax.checkpoint(step, policy=pol)
            _, (logps, logps_pos, mws) = jax.lax.scan(
                scan_step, (state0, prev_logp0), xs,
                unroll=c.scan_unroll)
            logps = jnp.swapaxes(logps, 0, 1)            # [B, T, vocab]
            logps_pos = jnp.swapaxes(logps_pos, 0, 1)
            mws = jnp.swapaxes(mws, 0, 1)                # [B, T, 3]
        return {"logprobs": logps, "pos_logprobs": logps_pos,
                "module_weights": mws}

    def sample(self, feat_bef, feat_aft, feat_diff,
               sample_max: bool = True,
               temperature: Optional[float] = None,
               rng: Optional[jax.Array] = None,
               early_exit: bool = True) -> Dict[str, jnp.ndarray]:
        """_sample parity (:287-357): free-running greedy/multinomial decode
        (always eval-mode — the reference only calls it under no_grad).

        `early_exit=True` mirrors the reference's "quit loop if all
        sequences have finished" (:353-355) with a `lax.while_loop` over
        the step index — on trained models answers terminate far before
        the 90-step cap, so this typically cuts decode compute several-
        fold; outputs are identical either way (post-EOS slots are 0).

        Returns seq [B, T] int32 (0-terminated), logprobs [B, T] and
        module_weights [B, T, 3] (the per-step bef/diff/aft attention —
        the quantity draw_by_asking_question.py visualizes).
        module_weights rows are zeroed where seq == 0 (post-EOS): the
        while_loop path never computes them past the batch's last
        emission, so masking both paths keeps early_exit output-
        identical to the scan.
        """
        c = self.cfg
        B, T = feat_bef.shape[0], c.seq_length
        temp = temperature if temperature is not None else c.temperature

        if rng is None:
            rng = (jax.random.PRNGKey(0) if sample_max
                   else self.make_rng("sample"))
        keys = jax.random.split(rng, T)

        fused, feats = self._fused(feat_bef, feat_diff, feat_aft, None)
        if c.decode_kernel.startswith("pallas") and (
                c.weight_quant != "none" or c.fused_core):
            raise ValueError(
                "speaker.decode_kernel='pallas' replaces the whole XLA "
                "decode loop and cannot compose with weight_quant/"
                "fused_core (those rewrite the XLA scan step); disable "
                "one of the conflicting knobs")
        if (sample_max and not self.is_mutable_collection("params")
                and c.decode_kernel.startswith("pallas")):
            # whole-loop Pallas kernel (models/pallas_decode.py):
            # weights VMEM-resident, in-kernel early exit; greedy only
            from ekaid_tpu.models.pallas_decode import pallas_greedy_decode
            return pallas_greedy_decode(
                {"word_emb": self.word_emb,
                 "core": self.core.variables["params"],
                 "logit": self.logit.variables["params"]},
                c, self.policy, fused, feats,
                interpret=(c.decode_kernel == "pallas_interpret"),
                mesh=self.decode_mesh)
        state0 = self._init_state(B)
        bos = jnp.full((B,), c.bos_token, jnp.int32)
        vocab_iota = jnp.arange(c.vocab_size)
        fused_step = None
        if not self.is_mutable_collection("params"):
            if c.weight_quant == "int8":
                from ekaid_tpu.models.quant import make_quant_core_step
                fused_step = make_quant_core_step(
                    self.core.variables["params"], c, self.policy)
            elif c.fused_core:
                fused_step = make_fused_core_step(
                    self.core.variables["params"], c, self.policy)

        def step(carry, inp):
            state, it, unfinished = carry
            t, key = inp
            xt = self._embed_word(it, None)
            if fused_step is not None:
                h_lang, state, dpos, mw = fused_step(xt, fused, feats,
                                                     state)
            else:
                h_lang, state, dpos, mw = self.core(xt, fused, feats,
                                                    state, drop_key=None)
            logp, _ = self._out_logprobs(h_lang, dpos, None)
            # first-step NULL suppression (:319-322)
            logp = jnp.where((t == 0) & (vocab_iota == 0)[None],
                             -jnp.inf, logp)
            if c.decoding_constraint:
                # no-repeat of the previous emitted token (:324-327)
                banned = (vocab_iota[None] == it[:, None]) & (t > 0)
                logp = jnp.where(banned, -jnp.inf, logp)
            if sample_max:
                nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                lp = jnp.max(logp, axis=-1)
            else:
                nxt = jax.random.categorical(key, logp / temp,
                                             axis=-1).astype(jnp.int32)
                lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
            unfinished = unfinished & (nxt > 0)           # (:346-349)
            nxt = nxt * unfinished.astype(nxt.dtype)
            return (state, nxt, unfinished), (nxt, lp,
                                              mw.astype(jnp.float32))

        if self.is_mutable_collection("params"):
            carry = (state0, bos, jnp.ones((B,), bool))
            _, (tok, lp, mw) = step(carry, (jnp.int32(0), keys[0]))
            seq = jnp.broadcast_to(tok[:, None], (B, T))
            lps = jnp.broadcast_to(lp[:, None], (B, T))
            mws = jnp.broadcast_to(mw[:, None], (B, T, 3))
        elif early_exit:
            seq0 = jnp.zeros((B, T), jnp.int32)
            lps0 = jnp.zeros((B, T), jnp.float32)
            mws0 = jnp.zeros((B, T, 3), jnp.float32)

            def cond(s):
                t, _, _, unfinished, _, _, _ = s
                return (t < T) & jnp.any(unfinished)

            def body(s):
                t, state, it, unfinished, seq, lps, mws = s
                (state, nxt, unfinished), (tok, lp, mw) = step(
                    (state, it, unfinished), (t, keys[t]))
                seq = jax.lax.dynamic_update_slice(seq, tok[:, None],
                                                   (0, t))
                lps = jax.lax.dynamic_update_slice(
                    lps, lp.astype(lps.dtype)[:, None], (0, t))
                mws = jax.lax.dynamic_update_slice(
                    mws, mw[:, None, :], (0, t, 0))
                return t + 1, state, nxt, unfinished, seq, lps, mws

            _, _, _, _, seq, lps, mws = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), state0, bos, jnp.ones((B,), bool), seq0,
                 lps0, mws0))
        else:
            _, (seq, lps, mws) = jax.lax.scan(
                step, (state0, bos, jnp.ones((B,), bool)),
                (jnp.arange(T), keys), unroll=c.scan_unroll)
            seq = jnp.swapaxes(seq, 0, 1)
            lps = jnp.swapaxes(lps, 0, 1)
            mws = jnp.swapaxes(mws, 0, 1)                # [B, T, 3]
        # post-EOS weight rows -> 0 in BOTH paths (see docstring)
        mws = mws * (seq > 0)[..., None].astype(mws.dtype)
        return {"seq": seq, "logprobs": lps, "module_weights": mws}

    def sample_beam(self, feat_bef, feat_aft, feat_diff,
                    beam_size: Optional[int] = None,
                    group_size: Optional[int] = None,
                    diversity_lambda: Optional[float] = None
                    ) -> Dict[str, jnp.ndarray]:
        """Batched diverse-group beam search (_sample_beam +
        CaptionModel.beam_search parity, incl. group diversity,
        CaptionModel.py:34-50,129-181).

        Reference semantics kept: BOS priming with `bos_token` (:272),
        index-1 suppression (CaptionModel.py:137), local t==0 expands
        only one beam (CaptionModel.py:67-68), a beam emitting 0 is
        finalized and its running sum is killed at -1000
        (CaptionModel.py:159-171), candidate ranking uses the
        diversity-AUGMENTED cumulative logprob (CaptionModel.py:76,171),
        and the returned answer is group 0's best beam
        (done_beams[0]['seq'], dynamic_speaker_change_pos.py:280).

        Groups run on the reference's staggered schedule (group g is at
        local step t−g at global step t; groups are advanced in
        ascending order within a step, so group g's diversity penalty
        reads earlier groups' CURRENT token rows — including history
        rewritten by their later beam forks, CaptionModel.py:38-46,87-90).
        Each occurrence of a token among an earlier group's `bdash`
        beams at the same local step subtracts `diversity_lambda` once
        (the reference's stacking subtraction, CaptionModel.py:41-45).

        Returns seq [B, T] + logprob [B] (group 0's best), and
        group_seqs [B, G, T] + group_logprobs [B, G] over all groups.
        """
        c = self.cfg
        W_total = beam_size or c.beam_size
        G = group_size if group_size is not None else c.group_size
        lam = (diversity_lambda if diversity_lambda is not None
               else c.diversity_lambda)
        if W_total % G:
            raise ValueError(f"beam_size {W_total} not divisible by "
                             f"group_size {G}")
        W = W_total // G                          # bdash
        B, T = feat_bef.shape[0], c.seq_length
        V = c.vocab_size

        def expand(x):
            return jnp.repeat(x, W, axis=0)          # [B*W, ...]

        fused, feats = self._fused(expand(feat_bef), expand(feat_diff),
                                   expand(feat_aft), None)
        bos = jnp.full((B * W,), c.bos_token, jnp.int32)
        neg = jnp.asarray(-1e9, self.policy.softmax_dtype)

        def logprobs_for(it, state):
            xt = self._embed_word(it, None)
            h_lang, state, dpos, _ = self.core(xt, fused, feats, state,
                                               drop_key=None)
            logp, _ = self._out_logprobs(h_lang, dpos, None)
            # index-1 suppression (CaptionModel.py:137)
            logp = logp - jnp.where(jnp.arange(V)[None] == 1, 1000.0, 0.0)
            return logp, state

        def group_step(gstate, lt, prev_rows):
            """One beam step for one group at local time `lt`.
            prev_rows: [P, B, W] same-local-step tokens of the P earlier
            groups (None for group 0)."""
            state, it, seqs, sums, best_seq, best_p = gstate
            logp, state = logprobs_for(it, state)     # [B*W, V]
            logp = logp.reshape(B, W, V)
            if c.decoding_constraint:
                # suppress the previous emitted word (CaptionModel.py:134)
                banned = (jnp.arange(V)[None, None]
                          == it.reshape(B, W)[:, :, None]) & (lt > 0)
                logp = jnp.where(banned, -jnp.inf, logp)
            if prev_rows is not None:
                # diversity: −λ per occurrence across earlier groups'
                # beams (add_diversity, CaptionModel.py:38-46)
                counts = jax.vmap(
                    lambda toks: jnp.zeros(V).at[toks].add(1.0))(
                        jnp.swapaxes(prev_rows, 0, 1).reshape(B, -1))
                logp = logp - lam * counts[:, None, :].astype(logp.dtype)
            # beams that already emitted 0 are dead (sum == -1000)
            cand = sums[:, :, None] + logp            # [B, W, V]
            # at local t == 0 only beam 0 expands (all beams identical)
            cand = jnp.where(
                (lt == 0) & (jnp.arange(W)[None, :, None] > 0), neg,
                cand)
            flat = cand.reshape(B, W * V)
            top_p, top_i = jax.lax.top_k(flat, W)     # [B, W]
            src_beam = top_i // V
            tok = (top_i % V).astype(jnp.int32)

            # reorder carried tensors by the source beam
            def gather_beams(x):
                xb = x.reshape(B, W, *x.shape[1:])
                xg = jnp.take_along_axis(
                    xb, src_beam.reshape(B, W, *([1] * (xb.ndim - 2))),
                    axis=1)
                return xg.reshape(B * W, *x.shape[1:])

            state = {k: gather_beams(v) for k, v in state.items()}
            seqs = jnp.take_along_axis(seqs, src_beam[:, :, None], axis=1)
            seqs = seqs.at[:, :, lt].set(tok)

            finished = tok == 0
            # finalize: a finished beam competes for best; then dies
            cand_best = jnp.where(finished, top_p, neg)
            grp_best = jnp.max(cand_best, axis=1)
            grp_arg = jnp.argmax(cand_best, axis=1)
            improve = grp_best > best_p
            best_seq = jnp.where(
                improve[:, None],
                jnp.take_along_axis(seqs, grp_arg[:, None, None],
                                    axis=1)[:, 0], best_seq)
            best_p = jnp.where(improve, grp_best, best_p)
            sums = jnp.where(finished, -1000.0, top_p)
            return (state, tok.reshape(B * W), seqs, sums, best_seq,
                    best_p)

        def init_gstate():
            return (self._init_state(B * W), bos,
                    jnp.zeros((B, W, T), jnp.int32),
                    jnp.zeros((B, W), self.policy.softmax_dtype),
                    jnp.zeros((B, T), jnp.int32),
                    jnp.full((B,), -jnp.inf, self.policy.softmax_dtype))

        if self.is_mutable_collection("params"):
            # init trace: one eager step materializes every parameter
            gstates = [group_step(init_gstate(), jnp.int32(0), None)]
        else:
            def body(carry, t):
                gstates = list(carry)
                for g in range(G):
                    lt = t - g
                    active = (t >= g) & (t < T + g)
                    if g == 0:
                        prev_rows = None
                    else:
                        # earlier groups' tokens at THIS group's local
                        # step, from their current (post-fork) tables
                        prev_rows = jnp.stack([
                            jax.lax.dynamic_slice_in_dim(
                                gstates[p][2], jnp.clip(lt, 0, T - 1), 1,
                                axis=2)[:, :, 0]
                            for p in range(g)])        # [g, B, W]
                    new = group_step(gstates[g], lt, prev_rows)
                    gstates[g] = jax.tree.map(
                        lambda n, o: jnp.where(active, n, o), new,
                        gstates[g])
                return tuple(gstates), None

            carry = tuple(init_gstate() for _ in range(G))
            carry, _ = jax.lax.scan(body, carry, jnp.arange(T + G - 1),
                                    unroll=c.scan_unroll)
            gstates = list(carry)

        # per group: unfinished best beam as fallback (the
        # t == seq_length finalize, CaptionModel.py:160)
        g_seqs, g_ps = [], []
        for (state, it, seqs, sums, best_seq, best_p) in gstates:
            alive_best = jnp.max(sums, axis=1)
            alive_arg = jnp.argmax(sums, axis=1)
            use_alive = alive_best > best_p
            seq = jnp.where(
                use_alive[:, None],
                jnp.take_along_axis(seqs, alive_arg[:, None, None],
                                    axis=1)[:, 0], best_seq)
            g_seqs.append(seq)
            g_ps.append(jnp.where(use_alive, alive_best, best_p))
        return {"seq": g_seqs[0], "logprob": g_ps[0],
                "group_seqs": jnp.stack(g_seqs, axis=1),
                "group_logprobs": jnp.stack(g_ps, axis=1)}
