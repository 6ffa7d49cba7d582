"""On-chip A/B: Pallas VMEM NMS vs the blocked XLA NMS (ops/nms.py).

VERDICT r1 item 5: the Pallas kernel (ops/pallas_nms.py) is interpret-
mode verified; this times both implementations on the real chip at the
extraction geometry (R = post_nms_topk proposals per image, batch =
detector batch) and prints one JSON line per configuration. Run
single-flight with a generous timeout (memory/axon-tpu-quirks).

Usage:  python scripts/bench_nms.py [--iters 20] [--batch 8]
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


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--rois", type=int, default=1000)
    p.add_argument("--force_cpu", action="store_true")
    a = p.parse_args()

    if not a.force_cpu and not relay_up():
        print(json.dumps({"error": "axon relay down; rerun when "
                          "127.0.0.1:8083 answers"}))
        sys.exit(1)
    if a.force_cpu:
        import os
        os.environ["EKAID_PLATFORM"] = "cpu"
        from ekaid_tpu.utils.platform import apply_platform_env
        apply_platform_env()

    import jax
    import jax.numpy as jnp
    from ekaid_tpu.ops.nms import nms
    from ekaid_tpu.ops.pallas_nms import nms_pallas

    from ekaid_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    from bench import _slope_time
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    R, B = a.rois, a.batch
    centers = rng.uniform(100, 900, (B, R, 2))
    sizes = rng.uniform(20, 200, (B, R, 2))
    boxes_j = jnp.asarray(np.concatenate(
        [centers - sizes / 2, centers + sizes / 2],
        axis=-1).astype(np.float32))
    scores_j = jnp.asarray(rng.uniform(0, 1, (B, R)).astype(np.float32))

    def run(name, fn):
        # slope-chained timing (see bench.py docstring): chain each
        # step's boxes on the previous kept indices + a unique index,
        # end each chain with a tiny D2H fetch, take the slope
        @jax.jit
        def step(boxes, scores, carry, i):
            boxes = boxes + 1e-4 * (carry + i)
            keep, mask = fn(boxes, scores)
            return keep, mask, (keep.sum() + mask.sum()).astype(
                jnp.float32)

        t0 = time.perf_counter()
        keep, mask, carry = step(boxes_j, scores_j, jnp.float32(0),
                                 jnp.float32(0))
        _ = np.asarray(carry)
        compile_s = time.perf_counter() - t0

        def chain(n):
            c = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(n):
                _, _, c = step(boxes_j, scores_j, c, jnp.float32(i + 1))
            _ = np.asarray(c)
            return time.perf_counter() - t0

        dt, _fixed = _slope_time(chain, 5, 25)
        print(json.dumps({
            "impl": name, "platform": platform, "batch": B, "rois": R,
            "ms_per_batch": round(dt * 1e3, 3),
            "images_per_sec": round(B / dt, 1),
            "compile_s": round(compile_s, 1)}))
        return np.asarray(keep), np.asarray(mask)

    blocked = run("xla_blocked",
                  jax.vmap(lambda b, s: nms(b, s, 0.5, 100)))
    try:
        pallas = run("pallas_vmem",
                     jax.vmap(lambda b, s: nms_pallas(b, s, 0.5, 100)))
        # agreement check on kept sets
        agree = float(np.mean(
            np.sort(np.where(blocked[1].astype(bool), blocked[0], -1), -1)
            == np.sort(np.where(pallas[1].astype(bool), pallas[0], -1),
                       -1)))
        print(json.dumps({"kept_set_agreement": round(agree, 4)}))
    except Exception as e:
        print(json.dumps({"impl": "pallas_vmem",
                          "error": f"{type(e).__name__}: {e}"}))


if __name__ == "__main__":
    main()
