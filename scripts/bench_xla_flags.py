"""A/B decode-step compiler options (slope-chained, see bench.py).

The axon terminal forwards proto-backed xla_* options per-compile, so
jax's `compiler_options` can reach the TPU compiler. Candidates target
the decode scan's weight-streaming bottleneck (latency-hiding
scheduler overlaps the next step's HBM weight reads with compute).

Run single-flight: python scripts/bench_xla_flags.py
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

from bench import _slope_time  # noqa: E402

CANDIDATES = {
    "baseline": {},
    "latency_hiding": {
        "xla_tpu_enable_latency_hiding_scheduler": "true"},
    "more_vmem": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs_vmem": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "98304"},
}


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated candidate names")
    a = p.parse_args()
    if not relay_up():
        print(json.dumps({"error": "axon relay down"}))
        sys.exit(1)

    # NO persistent compile cache here: cached executables ignore
    # compiler_options (1 s "compiles" returning the baseline binary),
    # which silently voids the A/B
    import jax
    jax.config.update("jax_enable_compilation_cache", False)

    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    cfg = default_config()
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)
    bsz = cfg.data.test.batch_size
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, bsz, seed=0))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    params = cast_params_for_inference(params, policy)
    zero = jnp.zeros((bsz, cfg.speaker.seq_length), jnp.int32)

    def dstep(params, batch, carry, i):
        feedback = (carry.sum(-1, keepdims=True).astype(jnp.float32) + i)
        b = dict(batch, d_feats=batch["d_feats"]
                 + 1e-6 * feedback[:, :, None])
        return model.apply(params, b, method="decode",
                           sample_max=True)["seq"]

    names = (a.only.split(",") if a.only else list(CANDIDATES))
    bad = [n for n in names if n not in CANDIDATES]
    if bad:
        sys.exit(f"unknown candidate(s) {bad}; "
                 f"choose from {list(CANDIDATES)}")
    for name in names:
        opts = CANDIDATES[name]
        try:
            t0 = time.perf_counter()
            compiled = (jax.jit(dstep)
                        .lower(params, batch, zero, jnp.float32(0))
                        .compile(compiler_options=opts or None))
            carry = compiled(params, batch, zero, jnp.float32(0))
            _ = np.asarray(carry[0, 0])
            compile_s = time.perf_counter() - t0

            def chain(n):
                c = zero
                t0 = time.perf_counter()
                for i in range(n):
                    c = compiled(params, batch, c, jnp.float32(i + 1))
                _ = np.asarray(c[0, 0])
                return time.perf_counter() - t0

            per, fixed = _slope_time(chain, 10, 40)
            print(json.dumps({
                "options": name, "pairs_per_sec": round(bsz / per, 2),
                "ms_per_invocation": round(per * 1e3, 3),
                "fixed_latency_ms": round(fixed * 1e3, 1),
                "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"options": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
