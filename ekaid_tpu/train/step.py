"""The jitted train/eval steps and optimizer assembly.

Replaces the reference's imperative loop body (train_mimic.py:203-269:
.to(device) transfers, process_matrix re-broadcasts, two module forwards,
loss, backward, Adam step) with one donated, sharded XLA program.

Optimizer parity: utils/utils.py:96-99 — torch Adam with
betas=(alpha, beta)=(0.9, 0.999), eps 1e-8, weight_decay 0; StepLR with
step_size epochs / gamma (train_mimic.py:174-177). The reference's
word-embedding frozen copy needs no optimizer masking: its gradient is
exactly zero (stop_gradient), so Adam leaves it at init.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ekaid_tpu.models.ekaid import EkaidModel, total_loss
from ekaid_tpu.parallel.mesh import (batch_shardings, param_shardings,
                                     replicated)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(optim_cfg, steps_per_epoch: Optional[int] = None):
    """optax mirror of build_optimizer (utils/utils.py:82-101) + StepLR."""
    lr = optim_cfg.lr
    if steps_per_epoch:
        lr = optax.exponential_decay(
            init_value=optim_cfg.lr,
            transition_steps=optim_cfg.step_size * steps_per_epoch,
            decay_rate=optim_cfg.gamma,
            staircase=True)
    kind = optim_cfg.type
    if kind == "adam":
        tx = optax.adam(lr, b1=optim_cfg.alpha, b2=optim_cfg.beta,
                        eps=optim_cfg.epsilon)
        if optim_cfg.weight_decay > 0:
            tx = optax.adamw(lr, b1=optim_cfg.alpha, b2=optim_cfg.beta,
                             eps=optim_cfg.epsilon,
                             weight_decay=optim_cfg.weight_decay)
    elif kind == "sgd":
        tx = optax.sgd(lr)
    elif kind == "sgdm":
        tx = optax.sgd(lr, momentum=optim_cfg.alpha)
    elif kind == "sgdmom":
        tx = optax.sgd(lr, momentum=optim_cfg.alpha, nesterov=True)
    elif kind == "rmsprop":
        tx = optax.rmsprop(lr, decay=optim_cfg.alpha, eps=optim_cfg.epsilon)
    elif kind == "adagrad":
        tx = optax.adagrad(lr)
    else:
        raise ValueError(f"bad option for optimizer: {kind}")
    if optim_cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(optim_cfg.grad_clip), tx)
    return tx


def init_state(model: EkaidModel, tx, batch, rng) -> TrainState:
    p_rng, d_rng = jax.random.split(rng)
    params = model.init({"params": p_rng, "dropout": d_rng},
                        batch, train=True)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def train_step(model: EkaidModel, tx, att_reg_weight: float,
               state: TrainState, batch: Dict, rng,
               ss_prob: float = 0.0,
               param_cast: bool = False,
               accum_steps: int = 1,
               entropy_weight: float = 0.0,
               train: bool = True) -> Tuple[TrainState, Dict]:
    """One SGD step; pure function of (state, batch, rng).

    param_cast (dtypes.train_param_cast): cast f32 masters to the
    compute dtype once inside the grad — halves the decoder scan's
    per-step HBM weight reads (fwd + bwd) at the cost of bf16 weight-
    gradient accumulation across scan steps (see config.py).

    accum_steps (train.accum_steps): split the batch into that many
    microbatches, lax.scan the grad over them, apply ONE optimizer
    update — peak activation memory drops by the factor, enabling
    effective batches past the HBM ceiling. Loss/grads equal the
    full-batch step exactly (each microbatch term is normalized by the
    FULL batch's mask-sum/size, so terms sum to the batch loss); only
    the dropout/sampling mask draw differs (per-microbatch fold_in).

    train=False runs the step without dropout (several rates are
    reference-parity hard-coded, e.g. the change detector's 0.5) —
    the deterministic mode the accumulation-equivalence test uses."""
    step_rng = jax.random.fold_in(rng, state.step)
    d_rng, s_rng = jax.random.split(step_rng)

    def loss_fn(params, mb, rngs, lang_denom=None, batch_denom=None):
        if param_cast:
            from ekaid_tpu.utils.dtypes import cast_params_for_inference
            params = cast_params_for_inference(params, model.policy)
        out = model.apply(params, mb, ss_prob=ss_prob, train=train,
                          rngs=rngs)
        loss, aux = total_loss(out, mb, att_reg_weight,
                               entropy_weight=entropy_weight,
                               lang_denom=lang_denom,
                               batch_denom=batch_denom)
        return loss, aux

    if accum_steps > 1:
        B = batch["labels"].shape[0]
        if B % accum_steps:
            raise ValueError(
                f"batch size {B} not divisible by "
                f"train.accum_steps={accum_steps}")
        m = B // accum_steps
        # strided interleave (microbatch i = samples i::accum_steps):
        # under data-parallel sharding each device's block contributes
        # equally to EVERY microbatch, so no resharding is induced (a
        # contiguous split would park whole microbatches on a subset
        # of the mesh); the loss is permutation-invariant
        micro = jax.tree.map(
            lambda x: x.reshape((m, accum_steps) + x.shape[1:])
                       .swapaxes(0, 1), batch)
        # full-batch normalizers: microbatch losses then SUM to the
        # batch loss (logprobs span labels[:, 1:], decoder.py T=L-1)
        lang_denom = jnp.maximum(
            batch["masks"][:, 1:].astype(jnp.float32).sum(), 1.0)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, inp):
            loss_a, aux_a, grads_a = carry
            mb, i = inp
            rngs = {"dropout": jax.random.fold_in(d_rng, i),
                    "sample": jax.random.fold_in(s_rng, i)}
            (l, aux), g = grad_fn(state.params, mb, rngs,
                                  lang_denom=lang_denom, batch_denom=B)
            return (loss_a + l,
                    jax.tree.map(jnp.add, aux_a, aux),
                    jax.tree.map(jnp.add, grads_a, g)), None

        zeros_like_f = lambda t: jax.tree.map(
            lambda x: jnp.zeros(x.shape, x.dtype), t)
        aux0 = {"speaker_loss": jnp.float32(0), "att_reg": jnp.float32(0)}
        if entropy_weight:
            aux0["entropy"] = jnp.float32(0)
        (loss, aux, grads), _ = jax.lax.scan(
            body,
            (jnp.float32(0), aux0, zeros_like_f(state.params)),
            (micro, jnp.arange(accum_steps)))
    else:
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, batch, {"dropout": d_rng, "sample": s_rng})
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    metrics = {"total_loss": loss, **aux,
               "grad_norm": optax.global_norm(grads)}
    return new_state, metrics


def eval_step(model: EkaidModel, state: TrainState, batch: Dict):
    """Greedy decode (test_mimic.py:116-124 parity)."""
    return model.apply(state.params, batch, method="decode",
                       sample_max=True)


def _state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """Sharding pytree for a TrainState: params per the TP rules, adam
    moments like their params, everything else replicated."""
    p_sh = param_shardings(mesh, state.params)
    rep = replicated(mesh)
    params_struct = jax.tree.structure(state.params)

    def rec(node):
        if jax.tree.structure(node) == params_struct:
            return p_sh
        if hasattr(node, "_fields"):              # NamedTuple optax state
            return type(node)(*[rec(getattr(node, f))
                                for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(x) for x in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return rep

    return TrainState(step=rep, params=p_sh, opt_state=rec(state.opt_state))


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place an (unsharded) TrainState onto the mesh."""
    return jax.device_put(state, _state_shardings(mesh, state))


def make_jitted_steps(model: EkaidModel, tx, att_reg_weight: float,
                      mesh: Mesh, state: TrainState, batch: Dict,
                      ss_prob: float = 0.0, param_cast: bool = False,
                      accum_steps: int = 1, entropy_weight: float = 0.0):
    """Compile sharded train/eval steps over `mesh`.

    Params/opt_state follow the TP rules in parallel.mesh (replicated
    where no rule matches); batches shard over 'data'; gradients reduce
    via GSPMD-inserted psums over ICI. Returns (make_train, jit_eval,
    sharded_state) where make_train(ss_prob) yields the cached compiled
    step for that scheduled-sampling probability.
    """
    state_sh = _state_shardings(mesh, state)
    state = jax.device_put(state, state_sh)
    b_sh = batch_shardings(mesh, batch)
    rep = replicated(mesh)

    cache = {}

    def make_train(ss: float = ss_prob):
        """Compiled step for a given scheduled-sampling prob. The ramp
        (train_mimic.py:195-202) takes at most a handful of distinct
        values, each compiled once and cached."""
        key = round(float(ss), 6)
        if key not in cache:
            cache[key] = jax.jit(
                partial(train_step, model, tx, att_reg_weight,
                        ss_prob=key, param_cast=param_cast,
                        accum_steps=accum_steps,
                        entropy_weight=entropy_weight),
                in_shardings=(state_sh, b_sh, rep),
                out_shardings=(state_sh, rep),
                donate_argnums=(0,))      # donate `state`
        return cache[key]

    jit_eval = jax.jit(
        partial(eval_step, model),
        in_shardings=(state_sh, b_sh))
    return make_train, jit_eval, state
