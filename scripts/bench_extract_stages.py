"""Stage-by-stage extraction timing (slope-chained, see bench.py).

Splits the anatomy `extract` program into cumulative stages to locate
the non-backbone time (the full program runs at ~8% MFU while the
backbone conv math alone would be ~21 ms at batch 8):

  backbone   — ResNet50-FPN pyramid only
  proposals  — + RPN head, per-level top-k, joint NMS to 1000
  forward    — + ROIAlign + box head over 1000 proposals (__call__)
  extract    — + class-wise NMS, per-class top-1 selection

Run single-flight: python scripts/bench_extract_stages.py [--batch 8]
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


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--roi", default=None,
                   choices=["pallas", "canvas", "xla"],
                   help="override detector.roi_backend")
    p.add_argument("--norm", default=None,
                   help="override detector.norm (gn|frozen_bn)")
    p.add_argument("--rpn_topk", default=None,
                   choices=["exact", "approx"],
                   help="override detector.rpn_topk")
    p.add_argument("--s2d", action="store_true",
                   help="space-to-depth stem rewrite (A/B)")
    p.add_argument("--select", default=None, choices=["fused", "topk"],
                   help="override detector.select_impl (extract's "
                        "top-1-per-class A/B)")
    p.add_argument("--extract_topk", type=int, default=0,
                   help="override detector.extract_topk")
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
    from ekaid_tpu.config import default_config
    from ekaid_tpu.models.detector.faster_rcnn import FasterRCNN
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    platform = jax.devices()[0].platform
    cfg = default_config()
    from ekaid_tpu.utils.platform import resolve_roi_backend
    det = cfg.detector
    det = det.replace(roi_backend=(
        a.roi or resolve_roi_backend(det.roi_backend)))
    if a.rpn_topk:
        det = det.replace(rpn_topk=a.rpn_topk)
    if a.s2d:
        det = det.replace(s2d_stem=True)
    if a.select:
        det = det.replace(select_impl=a.select)
    if a.extract_topk:
        det = det.replace(extract_topk=a.extract_topk)
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = FasterRCNN(det, num_classes=det.num_anatomy_classes,
                       norm=(a.norm or det.norm), policy=policy)
    dummy = jnp.zeros((1, det.image_size, det.image_size, 3),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)
    params = cast_params_for_inference(params, policy)

    b = a.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 1, (b, det.image_size, det.image_size, 3)),
        jnp.float32)

    def backbone_fn(mdl, x):
        return mdl._features(x)[0].sum()

    def rpn_conv_fn(mdl, x):
        # RPN head convs only — isolates the top-k/NMS proposal
        # selection cost from the conv cost inside the proposals stage
        logits, deltas = mdl.rpn(mdl._features(x))
        return (sum(l.sum() for l in logits)
                + sum(d.sum() for d in deltas))

    def proposals_fn(mdl, x):
        _, (boxes, scores, valid) = mdl._proposals(mdl._features(x))
        return boxes.sum() + scores.sum()

    def forward_fn(mdl, x):
        out = mdl(x)
        return (out["roi_features"].sum() + out["cls_scores"].sum()
                + out["box_deltas"].sum())

    def extract_fn(mdl, x):
        return mdl.extract(x)["features"].sum()

    for name, fn in [("backbone", backbone_fn),
                     ("rpn_conv", rpn_conv_fn),
                     ("proposals", proposals_fn),
                     ("forward", forward_fn),
                     ("extract", extract_fn)]:
        @jax.jit
        def step(images, carry, i, fn=fn):
            pert = images + 1e-7 * (carry + i)
            return model.apply(params, pert, method=fn).astype(
                jnp.float32)

        try:
            flops = bytes_acc = 0.0
            try:
                ca = step.lower(images, jnp.float32(0),
                                jnp.float32(0)).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0))
                bytes_acc = float(ca.get("bytes accessed", 0.0))
            except Exception:
                pass

            t0 = time.perf_counter()
            _ = np.asarray(step(images, jnp.float32(0), jnp.float32(0)))
            compile_s = time.perf_counter() - t0

            def chain(n):
                c = jnp.float32(0)
                t0 = time.perf_counter()
                for i in range(n):
                    c = step(images, c, jnp.float32(i + 1))
                _ = np.asarray(c)
                return time.perf_counter() - t0

            dt, _ = _slope_time(chain, 2, 8)
            rec = {
                "stage": name, "platform": platform, "batch": b,
                "ms_per_batch": round(dt * 1e3, 1),
                "ms_per_image": round(dt * 1e3 / b, 2),
                "images_per_sec": round(b / dt, 2),
                "tflops": round(flops / 1e12, 4),
                "gbytes": round(bytes_acc / 1e9, 3),
                # v5e rooflines: which bound is this stage nearest?
                "compute_bound_ms": round(flops / 197e12 * 1e3, 2),
                "hbm_bound_ms": round(bytes_acc / 819e9 * 1e3, 2),
                "compile_s": round(compile_s, 1)}
            if flops and platform == "tpu":
                rec["mfu_pct"] = round(100.0 * flops / dt / 197e12, 2)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
