"""On-chip A/B: Pallas patch-DMA ROIAlign vs the XLA gather formulation.

Extraction geometry: p2..p5 level maps for a 1024² image (C=256 bf16),
R=1000 post-NMS proposals with the box-size distribution the level
heuristic expects. Slope-chained timing (see bench.py); also checks
numerical agreement of the two paths on-chip.

Run single-flight: python scripts/bench_roi.py [--rois 1000]
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
    p.add_argument("--rois", type=int, default=1000)
    p.add_argument("--channels", type=int, default=256)
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
    from ekaid_tpu.ops.roi_align import multilevel_roi_align
    from ekaid_tpu.ops.pallas_roi import multilevel_roi_align_pallas

    platform = jax.devices()[0].platform
    dt = jnp.bfloat16 if platform != "cpu" else jnp.float32
    rng = np.random.default_rng(0)
    fmaps = [jnp.asarray(rng.standard_normal(
        (256 >> i, 256 >> i, a.channels)), dt) for i in range(4)]
    scales = [0.25, 0.125, 0.0625, 0.03125]
    r = a.rois
    # realistic proposal sizes: log-uniform 20..900 px
    size = np.exp(rng.uniform(np.log(20), np.log(900), r))
    cx = rng.uniform(0, 1024, r)
    cy = rng.uniform(0, 1024, r)
    rois = jnp.asarray(np.stack(
        [np.clip(cx - size / 2, 0, 1023), np.clip(cy - size / 2, 0, 1023),
         np.clip(cx + size / 2, 1, 1024), np.clip(cy + size / 2, 1, 1024)],
        axis=1).astype(np.float32))

    results = {}
    for name, fn in [
            ("xla_gather", lambda b: multilevel_roi_align(
                fmaps, b, scales)),
            ("pallas_patch_dma", lambda b: multilevel_roi_align_pallas(
                fmaps, b, scales))]:
        @jax.jit
        def step(rois, carry, i, fn=fn):
            b = rois + 1e-4 * (carry + i)
            return fn(b).sum().astype(jnp.float32)

        try:
            t0 = time.perf_counter()
            first = step(rois, jnp.float32(0), jnp.float32(0))
            _ = np.asarray(first)
            compile_s = time.perf_counter() - t0

            def chain(n):
                c = jnp.float32(0)
                t0 = time.perf_counter()
                for i in range(n):
                    c = step(rois, c, jnp.float32(i + 1))
                _ = np.asarray(c)
                return time.perf_counter() - t0

            dt_s, _ = _slope_time(chain, 5, 25)
            results[name] = fn(rois)
            print(json.dumps({
                "impl": name, "platform": platform, "rois": r,
                "channels": a.channels,
                "ms_per_call": round(dt_s * 1e3, 3),
                "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"impl": name,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)

    if len(results) == 2:
        x = np.asarray(results["xla_gather"], np.float32)
        pz = np.asarray(results["pallas_patch_dma"], np.float32)
        rel = np.abs(x - pz).max() / (np.abs(x).max() + 1e-9)
        print(json.dumps({"max_rel_disagreement": float(rel)}))


if __name__ == "__main__":
    main()
