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
    p.add_argument("--only", default=None,
                   help="run a single impl (substring match)")
    p.add_argument("--batch", type=int, default=1,
                   help=">1 pools batch*rois ROIs in one batched call")
    p.add_argument("--pooling", default="separable",
                   choices=["separable", "kron"],
                   help="canvas per-ROI pooling form (A/B)")
    p.add_argument("--group", type=int, default=8,
                   help="canvas ROIs per grid step (sweep)")
    p.add_argument("--unroll", type=int, default=0,
                   help="canvas ROIs unrolled per fori body (0 = all; "
                        "group>8 needs unroll<=8 for compile size)")
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
    from ekaid_tpu.ops.pallas_roi import (multilevel_roi_align_canvas,
                                          multilevel_roi_align_pallas)

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
    if a.batch > 1:
        fmaps = [jnp.asarray(
            np.broadcast_to(np.asarray(f)[None],
                            (a.batch,) + f.shape).copy(), dt)
            for f in fmaps]
        rois = jnp.asarray(
            np.broadcast_to(np.asarray(rois)[None], (a.batch, r, 4))
            .copy())
        # the XLA path vmaps per image at this entry point
        xla_fn = lambda fm, b: jax.vmap(
            lambda m, rr: multilevel_roi_align(m, rr, scales)
        )(list(fm), b)
    else:
        xla_fn = lambda fm, b: multilevel_roi_align(list(fm), b, scales)

    results = {}
    for name, fn in [
            ("xla_gather", xla_fn),
            ("pallas_patch_dma",
             lambda fm, b: multilevel_roi_align_pallas(
                 list(fm), b, scales)),
            ("pallas_canvas",
             lambda fm, b: multilevel_roi_align_canvas(
                 list(fm), b, scales, pooling=a.pooling,
                 group=a.group, unroll=a.unroll))]:
        if a.only and a.only not in name:
            continue
        # fmaps MUST cross the jit boundary as arguments: a closure
        # embeds them as HLO constants (tens of MB of program, remote-
        # compile 413s at batch 8, and constant-folding distorts timing)
        @jax.jit
        def step(fmaps, rois, carry, i, fn=fn):
            b = rois + 1e-4 * (carry + i)
            return fn(tuple(fmaps), b).sum().astype(jnp.float32)

        try:
            t0 = time.perf_counter()
            first = step(fmaps, rois, jnp.float32(0), jnp.float32(0))
            _ = np.asarray(first)
            compile_s = time.perf_counter() - t0

            def chain(n):
                c = jnp.float32(0)
                t0 = time.perf_counter()
                for i in range(n):
                    c = step(fmaps, rois, c, jnp.float32(i + 1))
                _ = np.asarray(c)
                return time.perf_counter() - t0

            dt_s, _ = _slope_time(chain, 5, 25)
            results[name] = fn(tuple(fmaps), rois)
            print(json.dumps({
                "impl": name, "platform": platform, "rois": r,
                "batch": a.batch, "channels": a.channels,
                "ms_per_call": round(dt_s * 1e3, 3),
                "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"impl": name,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)

    if "xla_gather" in results:
        x = np.asarray(results["xla_gather"], np.float32)
        for name in ("pallas_patch_dma", "pallas_canvas"):
            if name in results:
                pz = np.asarray(results[name], np.float32)
                rel = np.abs(x - pz).max() / (np.abs(x).max() + 1e-9)
                print(json.dumps(
                    {"impl": name,
                     "max_rel_disagreement_vs_xla": float(rel)}))


if __name__ == "__main__":
    main()
