"""Extraction throughput sweep: images/sec at 1024² vs batch size.

VERDICT r1 item 2: demonstrate the batching win over the reference's
hook-locked batch-1 loop (ana_bbox_generator.py:557-621,
"only 1 is allowed" bbox_generator_by_location.py:636). Runs the
anatomy `extract` program at each batch size and prints one JSON line
per point, plus the XLA cost-analysis FLOPs so MFU can be derived.

Run single-flight on the chip: python scripts/bench_extract_sweep.py
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

V5E_BF16_PEAK = 197e12


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--norm", default=None, choices=["gn", "frozen_bn"],
                   help="backbone norm (frozen_bn = the converted-"
                        "checkpoint deployment path)")
    p.add_argument("--s2d", action="store_true",
                   help="space-to-depth stem rewrite (A/B; now the "
                        "default — kept for record replay)")
    p.add_argument("--extract_topk", type=int, default=0,
                   help="extraction proposal budget (0 = all "
                        "post_nms_topk; detector.extract_topk A/B)")
    p.add_argument("--fused_preds", action="store_true",
                   help="detector.rpn_fused_preds: objectness+deltas "
                        "as one conv (bit-identical; VERDICT r4 #8)")
    p.add_argument("--force_cpu", action="store_true")
    a = p.parse_args()

    if a.force_cpu:
        os.environ["EKAID_PLATFORM"] = "cpu"
        from ekaid_tpu.utils.platform import apply_platform_env
        apply_platform_env()
    elif not relay_up():
        print(json.dumps({"error": "axon relay down; rerun when "
                          "127.0.0.1:8083 answers"}))
        sys.exit(1)

    import jax
    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.extract.runner import build_detector_fns
    from ekaid_tpu.utils.platform import enable_compile_cache
    from bench import _slope_time

    enable_compile_cache()
    platform = jax.devices()[0].platform
    cfg = default_config()
    if a.image_size:
        cfg = cfg.replace(detector=cfg.detector.replace(
            image_size=a.image_size))
    if a.norm:
        cfg = cfg.replace(detector=cfg.detector.replace(norm=a.norm))
    if a.s2d:
        cfg = cfg.replace(detector=cfg.detector.replace(s2d_stem=True))
    if a.extract_topk:
        cfg = cfg.replace(detector=cfg.detector.replace(
            extract_topk=a.extract_topk))
    if a.fused_preds:
        cfg = cfg.replace(detector=cfg.detector.replace(
            rpn_fused_preds=True))
    det = cfg.detector
    rng = np.random.default_rng(0)

    for b in [int(x) for x in a.batches.split(",")]:
        cfg_b = cfg.replace(detector=det.replace(batch_size=b))
        ana_apply, _ = build_detector_fns(cfg_b)
        images = jnp.asarray(
            rng.uniform(0, 1, (b, det.image_size, det.image_size, 3)),
            jnp.float32)

        # slope-chained timing (bench.py docstring): the relay acks
        # before execution, so chain steps and slope out the roundtrip
        apply_fn = getattr(ana_apply, "__wrapped__", ana_apply)

        @jax.jit
        def estep(images, carry, i):
            images = images + 1e-7 * (carry + i)
            return apply_fn(images)["features"].sum().astype(
                jnp.float32)

        import numpy as onp
        t0 = time.perf_counter()
        _ = onp.asarray(estep(images, jnp.float32(0), jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        tflops = 0.0
        try:
            cost = estep.lower(images, jnp.float32(0),
                               jnp.float32(0)).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            tflops = float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            pass

        def chain(n):
            c = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(n):
                c = estep(images, c, jnp.float32(i + 1))
            _ = onp.asarray(c)
            return time.perf_counter() - t0

        dt, _fixed = _slope_time(chain, 2, 2 + a.iters)
        rec = {"batch": b, "platform": platform,
               "norm": cfg.detector.norm,
               "extract_topk": det.extract_topk,
               "rpn_fused_preds": getattr(det, "rpn_fused_preds", False),
               "image_size": det.image_size,
               "images_per_sec": round(b / dt, 2),
               "ms_per_image": round(dt * 1e3 / b, 2),
               "program_tflops": round(tflops, 2),
               "compile_s": round(compile_s, 1)}
        if tflops > 0 and platform != "cpu":
            rec["mfu_pct"] = round(100.0 * tflops * 1e12 / dt
                                   / V5E_BF16_PEAK, 2)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
