"""Training-step throughput (slope-chained, see bench.py).

The reference prints per-iteration train time every 50 iters
(train_mimic.py:204,271) on a single CUDA GPU at batch 64; this times
the donated jitted train step (forward + backward + Adam) at the same
workload shape on one chip. The chain is the natural one — each step's
output TrainState feeds the next — so every request is unique and
serially dependent by construction.

Run single-flight: python scripts/bench_train.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import V5E_BF16_PEAK, _slope_time  # noqa: E402


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--unroll", type=int, default=0,
                   help="override speaker.scan_unroll (0 = config)")
    p.add_argument("--cast", action="store_true",
                   help="dtypes.train_param_cast: one bf16 weight cast "
                        "per step instead of 90 per-use f32 reads")
    p.add_argument("--force_cpu", action="store_true")
    a = p.parse_args()

    if a.force_cpu:
        os.environ["EKAID_PLATFORM"] = "cpu"
        from ekaid_tpu.utils.platform import apply_platform_env
        apply_platform_env()
    elif not relay_up():
        print(json.dumps({"error": "axon relay down"}))
        sys.exit(1)

    from ekaid_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.train.step import (init_state, make_optimizer,
                                      train_step)
    from ekaid_tpu.utils.dtypes import Policy, canonical

    platform = jax.devices()[0].platform
    cfg = default_config()
    if a.unroll:
        cfg = cfg.replace(speaker=cfg.speaker.replace(
            scan_unroll=a.unroll))
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)
    tx = make_optimizer(cfg.train.optim)

    b = a.batch
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, b, seed=0))
    state = init_state(model, tx, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    step = jax.jit(partial(train_step, model, tx,
                           cfg.train.att_reg_weight, ss_prob=0.0,
                           param_cast=a.cast),
                   donate_argnums=(0,))

    tflops = 0.0
    try:
        cost = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        tflops = float(cost.get("flops", 0.0)) / 1e12
    except Exception:
        pass

    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    _ = np.asarray(metrics["total_loss"])
    compile_s = time.perf_counter() - t0

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, rng)
        _ = np.asarray(metrics["total_loss"])
        return time.perf_counter() - t0

    n_lo, n_hi = (5, 20) if platform != "cpu" else (1, 3)
    per, fixed = _slope_time(chain, n_lo, n_hi)
    rec = {"metric": "train_pairs_per_sec", "batch": b,
           "unroll": cfg.speaker.scan_unroll,
           "param_cast": bool(a.cast),
           "platform": platform,
           "pairs_per_sec": round(b / per, 2),
           "ms_per_step": round(per * 1e3, 2),
           "program_tflops": round(tflops, 4),
           "fixed_latency_ms": round(fixed * 1e3, 1),
           "compile_s": round(compile_s, 1)}
    if tflops > 0 and platform != "cpu":
        rec["mfu_pct"] = round(100.0 * tflops * 1e12 / per
                               / V5E_BF16_PEAK, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
