"""Building-block layers with torch-compatible initialization.

The reference model's trainable atoms are plain `nn.Linear`s plus
`weight_norm(Linear, dim=None)` wrappers (model/models/fc.py:27,33 —
scalar-g weight norm over the whole matrix). Training dynamics depend on
the init distribution, so `DenseT` reproduces torch Linear's
kaiming-uniform(a=√5) default — U(±1/√fan_in) for both kernel and bias —
and `WNDense` reparameterizes kernel = g · v / ‖v‖_F with g initialized
to ‖v_init‖ (torch weight_norm semantics for dim=None).

RNN cells: `LSTMCell` matches torch.nn.LSTMCell gate equations
(dynamic_speaker_change_pos.py:57,88); `GRU` matches torch.nn.GRU
(language_model.py:66) with the input projection hoisted into one big
MXU-friendly matmul over the whole sequence and only the recurrent matmul
inside `lax.scan`.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.utils.dtypes import Policy, F32


def dropout(x, rate: float, key: Optional[jax.Array]):
    """Functional inverted dropout; identity when key is None (eval).

    Used wherever a setup()-style module (or a lax.scan body) needs
    per-call masks without flax's inline-Dropout restrictions.
    """
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear default."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class DenseT(nn.Module):
    """Dense with torch-Linear default init."""

    features: int
    use_bias: bool = True
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_uniform_init(fan_in),
                            (fan_in, self.features), self.policy.param_dtype)
        y = jnp.dot(self.policy.cast_compute(x),
                    self.policy.cast_compute(kernel),
                    preferred_element_type=self.policy.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in),
                              (self.features,), self.policy.param_dtype)
            y = y + self.policy.cast_compute(bias)
        return y


class WNDense(nn.Module):
    """Weight-normalized Dense: kernel = g * v / ||v||_F (scalar g),
    parity with torch weight_norm(Linear, dim=None) (fc.py:27)."""

    features: int
    use_bias: bool = True
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        v = self.param("v", torch_uniform_init(fan_in),
                       (fan_in, self.features), self.policy.param_dtype)
        g = self.param("g", lambda rng: jnp.linalg.norm(
            v.astype(jnp.float32)).astype(self.policy.param_dtype))
        norm = jnp.linalg.norm(v.astype(jnp.float32))
        kernel = (g.astype(jnp.float32) / norm) * v.astype(jnp.float32)
        y = jnp.dot(self.policy.cast_compute(x),
                    self.policy.cast_compute(kernel),
                    preferred_element_type=self.policy.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in),
                              (self.features,), self.policy.param_dtype)
            y = y + self.policy.cast_compute(bias)
        return y


class FCNet(nn.Module):
    """Dropout→WNDense(→act) stack, parity with model/models/fc.py:15-39.

    dims=[in, h1, ..., out]; dropout precedes every linear; activation
    after every linear when `act` is set ('' or None disables, as the
    reference's act='' / act=None call sites do).
    """

    dims: Sequence[int]
    act: Optional[str] = "relu"
    dropout: float = 0.0
    use_bias: bool = True
    policy: Policy = F32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act_fn: Optional[Callable] = None
        if self.act not in ("", None):
            act_fn = getattr(nn, self.act.lower())
        dims = list(self.dims)
        assert dims[0] == x.shape[-1], (
            f"FCNet input dim {x.shape[-1]} != declared {dims[0]}")
        for out_dim in dims[1:]:
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = WNDense(out_dim, use_bias=self.use_bias,
                        policy=self.policy)(x)
            if act_fn is not None:
                x = act_fn(x)
        return x


class LSTMCell(nn.Module):
    """torch.nn.LSTMCell parity: one fused [x, h] @ W -> 4H projection,
    gate order (i, f, g, o), two bias vectors folded into one."""

    hidden: int
    policy: Policy = F32

    @nn.compact
    def __call__(self, x, h, c, pre=None, pre_width: int = 0):
        """pre/pre_width: optional precomputed input projection — `pre`
        [B, 4H] is the contribution of the FIRST `pre_width` rows of
        w_ih (x then carries only the remaining features). Lets a
        caller hoist loop-invariant or teacher-forced input matmuls out
        of a scan (decoder.teacher_forcing train_hoist); same math up
        to summation order. Param shapes are unchanged — `pre_width`
        only offsets the w_ih row slice."""
        in_dim = x.shape[-1] + pre_width
        w_ih = self.param("w_ih", torch_uniform_init(self.hidden),
                          (in_dim, 4 * self.hidden), self.policy.param_dtype)
        w_hh = self.param("w_hh", torch_uniform_init(self.hidden),
                          (self.hidden, 4 * self.hidden),
                          self.policy.param_dtype)
        b = self.param("b", torch_uniform_init(self.hidden),
                       (4 * self.hidden,), self.policy.param_dtype)
        cast = self.policy.cast_compute
        # no slice when pre_width == 0: w_ih[0:] would insert a slice
        # op into the jaxpr and invalidate the persistent compile cache
        # for every pre-existing program (the default path must trace
        # byte-identically to the pre-`pre` version)
        w_in = cast(w_ih)[pre_width:] if pre_width else cast(w_ih)
        xw = jnp.dot(cast(x), w_in,
                     preferred_element_type=self.policy.compute_dtype)
        if pre is not None:
            xw = xw + pre
        z = (xw
             + jnp.dot(cast(h), cast(w_hh),
                       preferred_element_type=self.policy.compute_dtype)
             + cast(b))
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        g = jnp.tanh(g)
        o = nn.sigmoid(o)
        c = f * cast(c) + i * g
        h = o * jnp.tanh(c)
        return h, c


class GRU(nn.Module):
    """Full-sequence GRU, torch.nn.GRU(batch_first=True) parity.

    x: [B, L, D] -> outputs [B, L, H] (h0 = zeros, matching
    QuestionEmbedding.init_hidden, language_model.py:78-86).
    The input projection for all gates runs as one [B, L, 3H] matmul;
    the scan carries only the [B, H] state.
    """

    hidden: int
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        H = self.hidden
        w_ih = self.param("w_ih", torch_uniform_init(H),
                          (in_dim, 3 * H), self.policy.param_dtype)
        w_hh = self.param("w_hh", torch_uniform_init(H),
                          (H, 3 * H), self.policy.param_dtype)
        b_ih = self.param("b_ih", torch_uniform_init(H), (3 * H,),
                          self.policy.param_dtype)
        b_hh = self.param("b_hh", torch_uniform_init(H), (3 * H,),
                          self.policy.param_dtype)
        cast = self.policy.cast_compute

        x_proj = (jnp.dot(cast(x), cast(w_ih),
                          preferred_element_type=self.policy.compute_dtype)
                  + cast(b_ih))                      # [B, L, 3H]
        w_hh_c = cast(w_hh)
        b_hh_c = cast(b_hh)

        def step(h, xp):
            hp = jnp.dot(h, w_hh_c,
                         preferred_element_type=self.policy.compute_dtype
                         ) + b_hh_c
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        B = x.shape[0]
        h0 = jnp.zeros((B, H), self.policy.compute_dtype)
        xs = jnp.swapaxes(x_proj, 0, 1)              # [L, B, 3H]
        _, ys = jax.lax.scan(step, h0, xs)
        return jnp.swapaxes(ys, 0, 1)                # [B, L, H]


def embedding_init_normal(padding_idx: Optional[int] = None):
    """torch nn.Embedding default init N(0,1), with the padding row zeroed
    (WordEmbedding padding_idx=ntoken, language_model.py:26)."""

    def init(key, shape, dtype=jnp.float32):
        table = jax.random.normal(key, shape, dtype)
        if padding_idx is not None:
            table = table.at[padding_idx].set(0.0)
        return table

    return init
