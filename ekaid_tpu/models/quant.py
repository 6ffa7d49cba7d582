"""Int8 weight streaming for the free-running decoder (TPU-first knob;
no reference counterpart — the reference decodes f32 torch weights,
dynamic_speaker_change_pos.py:287).

The 90-step decode scan re-reads every DynamicCore weight matrix from
HBM each step (~29 MB bf16 -> 2.65 GB/invocation at seq 90), which is
the dominant term of the decode roofline at eval batch 64 (docs/
STATUS.md round-2 analysis). Storing the large core matrices as
per-output-channel symmetric int8 with an f32 scale row halves that
stream; the dequantize (`q.astype(f32) * s -> bf16`) happens INSIDE the
scan body at each use site so XLA's operand fusion reads int8 from HBM
and dequantizes in registers. `lax.optimization_barrier` pins the int8
buffers inside the loop — without it, while-loop invariant code motion
may hoist the dequantized bf16 copy out of the scan and the traffic win
evaporates.

Quantization error is ~0.4% relative per weight (127 levels per max-abs
column); the decode A/B (scripts/bench_quant_decode.py) gates the knob
on answer agreement with the bf16 path. Eval-only — training and
teacher forcing never see quantized weights (`speaker.weight_quant`
applies to `sample` exactly like `speaker.fused_core`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.utils.dtypes import Policy

# kernels at least this many elements are stored int8; smaller ones
# (weight_fc [512,3], weight_pos, pos2, biases) stay bf16 — they are
# <2% of the stream and the tiny softmax heads are precision-sensitive
QUANT_MIN_ELEMS = 65536


def quantize_matrix(w: jnp.ndarray):
    """Per-output-channel symmetric int8: returns (q int8 [I,O],
    scale f32 [O]) with w ~= q * scale."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_core_params(core_params, policy: Policy):
    """DynamicCore param tree -> {name: (q, scale) | bf16 array} flat
    dict keyed 'module.param' (e.g. 'gate1x.kernel')."""
    out = {}
    for mod, sub in core_params.items():
        for name, w in sub.items():
            key = f"{mod}.{name}"
            if w.ndim == 2 and w.size >= QUANT_MIN_ELEMS:
                out[key] = quantize_matrix(w)
            else:
                out[key] = policy.cast_compute(w)
    return out


def make_quant_core_step(core_params, cfg: Any, policy: Policy):
    """Eval-mode DynamicCore step (decoder.py::DynamicCore.__call__ math,
    drop_key=None) over int8-streamed weights.

    Same parameters, same math up to the int8 rounding of the large
    kernels; the softmax heads (weight_fc/weight_pos/pos2) and all
    biases run bf16 exactly as the module path does.
    """
    qp = quantize_core_params(core_params, policy)
    dt = policy.compute_dtype
    cast = policy.cast_compute

    def step(xt, fused_embed, feats, state) -> Dict[str, jnp.ndarray]:
        # the barrier is anchored on a LOOP-CARRIED value: a barrier
        # over only the (loop-invariant) int8 buffer is itself loop-
        # invariant, and while-loop LICM hoists the whole barrier+
        # dequant chain out of the scan — materializing the bf16 copy
        # once and streaming IT per step, which silently restores the
        # full bf16 traffic (measured: identical b64/b128 intercepts
        # with and without quant before this fix)
        anchor = state["c_lang"]

        def weight(name):
            v = qp[name]
            if isinstance(v, tuple):
                q, s = v
                q, _ = jax.lax.optimization_barrier((q, anchor))
                return (q.astype(jnp.float32) * s).astype(dt)
            return v

        def dense(x, mod):
            y = jnp.dot(x, weight(f"{mod}.kernel"),
                        preferred_element_type=dt)
            return y + qp[f"{mod}.bias"]

        def lstm(mod, x, h, c):
            z = (jnp.dot(x, weight(f"{mod}.w_ih"),
                         preferred_element_type=dt)
                 + jnp.dot(h, weight(f"{mod}.w_hh"),
                           preferred_element_type=dt)
                 + qp[f"{mod}.b"])
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = nn.sigmoid(f) * cast(c) + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return h, c

        prev_h = state["h_lang"]
        h_mod, c_mod = lstm(
            "module_att_lstm",
            jnp.concatenate([fused_embed, prev_h], axis=-1),
            state["h_mod"], state["c_mod"])
        module_weights = jax.nn.softmax(
            policy.cast_softmax(dense(h_mod, "weight_fc")), axis=-1)

        vpos = nn.relu(dense(prev_h, "pos1"))
        dpos = dense(vpos, "weight_pos")
        ppos = dense(cast(jax.nn.softmax(policy.cast_softmax(dpos),
                                         axis=-1)), "pos2")

        att_feat = jnp.einsum("bk,bkd->bd", cast(module_weights), feats,
                              preferred_element_type=dt)
        gate_in = jnp.concatenate([prev_h, ppos, att_feat], axis=-1)
        gate_h = nn.relu(dense(gate_in, "gate1x"))
        gate = nn.sigmoid(dense(gate_h, "gate2x"))

        h_lang, c_lang = lstm(
            "lang_lstm", jnp.concatenate([xt, gate * att_feat], axis=-1),
            state["h_lang"], state["c_lang"])
        new_state = {"h_mod": h_mod, "c_mod": c_mod,
                     "h_lang": h_lang, "c_lang": c_lang}
        return h_lang, new_state, dpos, module_weights

    return step
