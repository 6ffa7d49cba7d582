"""Mixed-precision policy for TPU.

The reference runs float32 weights with float64 adjacency data
(rcc_dataset_pos_mimic.py:180-185, cast to float at graph_att.py:74).
On TPU the profitable policy is bf16 compute / f32 params / f32 softmax;
this module centralizes that decision so every model module agrees.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

_NAMES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float64": jnp.float64,
}


def canonical(name_or_dtype):
    if isinstance(name_or_dtype, str):
        return _NAMES[name_or_dtype]
    return name_or_dtype


@dataclass(frozen=True)
class Policy:
    param_dtype: object = jnp.float32
    compute_dtype: object = jnp.bfloat16
    softmax_dtype: object = jnp.float32

    @classmethod
    def from_config(cls, dtype_cfg) -> "Policy":
        return cls(
            param_dtype=canonical(dtype_cfg.param_dtype),
            compute_dtype=canonical(dtype_cfg.compute_dtype),
            softmax_dtype=canonical(dtype_cfg.softmax_dtype),
        )

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_softmax(self, x):
        return jnp.asarray(x, self.softmax_dtype)


def cast_params_for_inference(params, policy: "Policy"):
    """Pre-cast float32 params to the compute dtype for inference.

    flax modules with dtype=bf16 re-cast f32 weights at every use — in
    the 90-step scanned decoder that reads every weight matrix from HBM
    as f32 each step (2× the bytes of bf16). One up-front cast halves
    decode weight traffic. Plain kernels/biases round identically to
    the per-use cast (bit-equal outputs, tested); weight-norm params
    are SKIPPED because WNDense computes ‖v‖ on the raw param before
    casting — pre-rounding v would change the norm. Train state must
    keep f32 masters — use this only on a decode/serving copy.
    """
    if policy.compute_dtype == jnp.float32:
        return params

    def is_weight_norm_module(node) -> bool:
        # structural detection: a WNDense module dict carries exactly
        # the weight-norm pair {v, g} (+ optional bias) with a
        # weight-norm shape contract — v a matrix kernel, g either a
        # scalar (dim=None weight norm, fc.py parity — what WNDense
        # uses) or a per-output-channel vector (torch dim=0 form).
        # Matching the module NAME ('WNDense_0') would silently stop
        # protecting a WNDense given an explicit name=; matching keys
        # alone could misfire on an unrelated {v, g} module (ADVICE
        # r2), so the ranks are checked too. Skipping the cast is the
        # safe direction (minor perf loss, never lost f32 protection).
        if not ("v" in node and "g" in node
                and set(node) <= {"v", "g", "bias"}):
            return False
        v, g = node["v"], node["g"]
        if getattr(v, "ndim", None) != 2:
            return False
        gnd = getattr(g, "ndim", None)
        return gnd == 0 or (gnd == 1
                            and g.shape == v.shape[-1:])

    def cast(node):
        if hasattr(node, "keys"):             # dict / FrozenDict
            if is_weight_norm_module(node):
                return node
            return type(node)({k: cast(v) for k, v in node.items()})
        if hasattr(node, "dtype") and node.dtype == jnp.float32:
            return jnp.asarray(node, policy.compute_dtype)
        return node

    return cast(params)


F32 = Policy(compute_dtype=jnp.float32)
BF16 = Policy()
