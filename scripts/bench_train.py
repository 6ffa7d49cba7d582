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
    p.add_argument("--buckets", default="",
                   help="comma list of answer-length buckets; trims the "
                        "teacher-forcing scan to the smallest covering "
                        "bucket (synthetic answers are < 45 tokens, so "
                        "e.g. --buckets 48 runs a 48-step scan)")
    p.add_argument("--unroll", type=int, default=0,
                   help="override speaker.scan_unroll (0 = config)")
    p.add_argument("--cast", action="store_true",
                   help="dtypes.train_param_cast: one bf16 weight cast "
                        "per step instead of 90 per-use f32 reads")
    p.add_argument("--remat", default="none",
                   choices=["none", "dots", "full"],
                   help="speaker.remat policy for the decode scan "
                        "backward (VERDICT r2 do #5)")
    p.add_argument("--hoist", action="store_true",
                   help="speaker.train_hoist: hoist the teacher-forcing "
                        "scan's input-side matmuls (loop-invariant "
                        "fused@w_ih + all-T word-embed projections) out "
                        "of the 90-step serial loop")
    p.add_argument("--stages", action="store_true",
                   help="also time fwd-only and fwd+bwd sub-programs "
                        "and print their XLA flops/bytes rooflines")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches "
                        "(train.accum_steps)")
    p.add_argument("--pair_batch", action="store_true",
                   help="change_detector.pair_batch: bef/aft through "
                        "one [2B] relation-encoder pass (3 GAT programs "
                        "per step instead of 6)")
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
    if a.remat != "none":
        cfg = cfg.replace(speaker=cfg.speaker.replace(remat=a.remat))
    if a.hoist:
        cfg = cfg.replace(speaker=cfg.speaker.replace(train_hoist=True))
    if a.pair_batch:
        cfg = cfg.replace(change_detector=cfg.change_detector.replace(
            pair_batch=True))
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)
    tx = make_optimizer(cfg.train.optim)

    b = a.batch
    host_batch = synthetic_batch(cfg, b, seed=0)
    if a.buckets:
        from ekaid_tpu.data.pipeline import trim_batch_to_bucket
        buckets = tuple(int(x) for x in a.buckets.split(","))
        host_batch = trim_batch_to_bucket(host_batch, buckets,
                                          cfg.speaker.seq_length)
    scan_t = host_batch["labels"].shape[1] - 1
    batch = jax.tree.map(jnp.asarray, host_batch)
    state = init_state(model, tx, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    step = jax.jit(partial(train_step, model, tx,
                           cfg.train.att_reg_weight, ss_prob=0.0,
                           param_cast=a.cast, accum_steps=a.accum),
                   donate_argnums=(0,))

    tflops = 0.0
    try:
        cost = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        tflops = float(cost.get("flops", 0.0)) / 1e12
    except Exception:
        pass
    # cost_analysis counts each while body ONCE — the teacher-forcing
    # fwd scan and its backward scan each execute scan_t times. Add
    # the missing (scan_t - 1) trips of fwd body + backward body
    # (standard 2x-forward for the two transposed dots per matmul);
    # see bench.py::_decode_loop_tflops. At accum > 1 the microbatch
    # scan multiplies trip counts and microbatch bodies are smaller —
    # the supplement is exact at accum=1 and skipped otherwise.
    loop_tflops = 0.0
    if a.accum == 1:
        from bench import _decode_loop_tflops
        body_fwd = _decode_loop_tflops(state.params, b, steps=1)
        loop_tflops = body_fwd * 3 * max(scan_t - 1, 0)
    total_tflops = tflops + loop_tflops

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
           "scan_steps": scan_t,
           "unroll": cfg.speaker.scan_unroll,
           "param_cast": bool(a.cast),
           "platform": platform,
           "pairs_per_sec": round(b / per, 2),
           "ms_per_step": round(per * 1e3, 2),
           "program_tflops": round(total_tflops, 4),
           "program_tflops_cost_analysis": round(tflops, 4),
           "fixed_latency_ms": round(fixed * 1e3, 1),
           "compile_s": round(compile_s, 1)}
    if total_tflops > 0 and platform != "cpu":
        rec["mfu_pct"] = round(100.0 * total_tflops * 1e12 / per
                               / V5E_BF16_PEAK, 2)
    rec["remat"] = cfg.speaker.remat
    rec["accum"] = a.accum
    rec["hoist"] = bool(a.hoist)
    print(json.dumps(rec))

    if a.stages:
        # sub-program rooflines: XLA's own flops + bytes-accessed
        # estimates vs v5e peaks locate whether each stage is compute-
        # or HBM-bound, and the measured time says how far off it runs
        HBM_GBPS = 819e9
        from ekaid_tpu.models.ekaid import total_loss

        def fwd_only(params, batch, rng):
            out = model.apply(params, batch, ss_prob=0.0, train=True,
                              rngs={"dropout": rng, "sample": rng})
            loss, _ = total_loss(out, batch, cfg.train.att_reg_weight)
            return loss

        def fwd_bwd(params, batch, rng):
            loss, grads = jax.value_and_grad(fwd_only)(params, batch,
                                                       rng)
            # consume every grad so the backward cannot be DCE'd
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return loss, gsum

        @jax.jit
        def fwd_step(params, batch, rng, carry):
            b2 = dict(batch)
            b2["d_feats"] = b2["d_feats"] + 1e-7 * carry
            return fwd_only(params, b2, rng).astype(jnp.float32)

        @jax.jit
        def fwdbwd_step(params, batch, rng, carry):
            b2 = dict(batch)
            b2["d_feats"] = b2["d_feats"] + 1e-7 * carry
            loss, gsum = fwd_bwd(params, b2, rng)
            return (loss + 1e-30 * gsum).astype(jnp.float32)

        from bench import _decode_loop_tflops
        body_fwd_fl = _decode_loop_tflops(state.params, b,
                                          steps=1) * 1e12
        for name, fn, extra_fl in [
                ("forward", fwd_step, body_fwd_fl * (scan_t - 1)),
                ("forward+backward", fwdbwd_step,
                 body_fwd_fl * 3 * (scan_t - 1))]:
            try:
                flops = bytes_acc = 0.0
                try:
                    ca = fn.lower(state.params, batch, rng,
                                  jnp.float32(0)).compile(
                                      ).cost_analysis()
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                    # + the while-body trips cost_analysis omits
                    # (bodies counted once; see bench.py)
                    flops = float(ca.get("flops", 0.0)) + extra_fl
                    bytes_acc = float(ca.get("bytes accessed", 0.0))
                except Exception:
                    pass
                c0 = fn(state.params, batch, rng, jnp.float32(0))
                _ = np.asarray(c0)

                def chain(n, fn=fn):
                    c = jnp.float32(0)
                    t0 = time.perf_counter()
                    for _ in range(n):
                        c = fn(state.params, batch, rng, c)
                    _ = np.asarray(c)
                    return time.perf_counter() - t0

                dt, _ = _slope_time(chain, n_lo, n_hi)
                srec = {"stage": name, "ms": round(dt * 1e3, 2),
                        "tflops": round(flops / 1e12, 4),
                        "gbytes": round(bytes_acc / 1e9, 3),
                        "compute_bound_ms": round(
                            flops / V5E_BF16_PEAK * 1e3, 2),
                        "hbm_bound_ms": round(
                            bytes_acc / HBM_GBPS * 1e3, 2)}
                if flops:
                    srec["mfu_pct"] = round(
                        100.0 * flops / dt / V5E_BF16_PEAK, 2)
                print(json.dumps(srec), flush=True)
            except Exception as e:
                print(json.dumps({"stage": name,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)


if __name__ == "__main__":
    main()
