"""Per-group backbone timing vs the analytic roofline floors.

Times each conv group of the extraction backbone as an ISOLATED jitted
program (slope-chained, see bench.py) against its own XLA cost-analysis
rooflines — the evidence layer under docs/perf/EXTRACTION_BOUND.md:
the full-program gap over the perfect-fusion floor
(scripts/roofline_extract.py) is attributed group by group, so the
bound argument rests on measured per-group kernel efficiency instead of
a whole-program hand-wave.

Groups (batch x 1024^2, frozen_bn deployment config, s2d stem):
  stem  — s2d 7x7-equivalent conv + norm + 3x3/2 maxpool
  c2-c5 — bottleneck stages at their true input shapes
  fpn   — laterals + top-down merge + output convs
  rpn   — RPN head convs over p2..p6

Caveat: isolated groups re-pay HBM for their inputs/outputs that the
fused full program may keep in flight, so the SUM of group times is an
upper-ish bound of the full backbone; each group's ratio-over-its-own-
roofline is the honest efficiency signal.

Reference anchor: the backbone these groups re-design is the
Detectron2 R50-FPN of ana_bbox_generator.py:557-621.

Run single-flight: python scripts/bench_backbone_groups.py [--batch 8]
"""

from __future__ import annotations

import argparse
import functools
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
    p.add_argument("--norm", default="frozen_bn")
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--only", default="",
                   help="comma list of group names to run (default all)")
    p.add_argument("--fused_preds", action="store_true",
                   help="rpn_fused_preds: objectness+deltas as one "
                        "15-channel conv (bit-identical; VERDICT r4 #8)")
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
    from flax import linen as nn
    from ekaid_tpu.models.detector.backbone import (Bottleneck,
                                                    SpaceToDepthStem,
                                                    make_norm)
    from ekaid_tpu.models.detector.rpn import RPNHead
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    platform = jax.devices()[0].platform
    policy = Policy(compute_dtype=canonical("bfloat16"))
    dt = policy.compute_dtype
    b, s = a.batch, a.image_size

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = policy.cast_compute(x)
            x = SpaceToDepthStem(64, dtype=dt, name="stem_conv")(x)
            x = nn.relu(make_norm(a.norm, 64, policy, "stem_norm")(x))
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    class Stage(nn.Module):
        depth: int
        ch: int
        first_stride: int

        @nn.compact
        def __call__(self, x):
            for i in range(self.depth):
                x = Bottleneck(self.ch,
                               stride=self.first_stride if i == 0 else 1,
                               norm=a.norm, policy=policy,
                               name=f"b{i}")(x)
            return x

    class FPN(nn.Module):
        @nn.compact
        def __call__(self, c2, c3, c4, c5):
            c = {2: c2, 3: c3, 4: c4, 5: c5}
            lat = {lvl: nn.Conv(256, (1, 1), dtype=dt,
                                name=f"lateral{lvl}")(c[lvl])
                   for lvl in (2, 3, 4, 5)}
            merged = {5: lat[5]}
            for lvl in (4, 3, 2):
                up = merged[lvl + 1]
                up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
                up = up[:, :lat[lvl].shape[1], :lat[lvl].shape[2]]
                merged[lvl] = lat[lvl] + up
            outs = [nn.Conv(256, (3, 3), padding=1, dtype=dt,
                            name=f"out{lvl}")(merged[lvl])
                    for lvl in (2, 3, 4, 5)]
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            return outs

    class RPN(nn.Module):
        @nn.compact
        def __call__(self, feats):
            logits, deltas = RPNHead(channels=256, num_anchors=3,
                                     policy=policy,
                                     fused_preds=a.fused_preds,
                                     name="head")(feats)
            return (sum(l.sum() for l in logits)
                    + sum(d.sum() for d in deltas))

    s4 = s // 4
    pyramid_shapes = [(b, s4, s4, 256), (b, s4 // 2, s4 // 2, 256),
                      (b, s4 // 4, s4 // 4, 256),
                      (b, s4 // 8, s4 // 8, 256),
                      (b, s4 // 16, s4 // 16, 256)]
    groups = [
        ("stem", Stem(), [(b, s, s, 3)]),
        ("c2", Stage(3, 256, 1), [(b, s4, s4, 64)]),
        ("c3", Stage(4, 512, 2), [(b, s4, s4, 256)]),
        ("c4", Stage(6, 1024, 2), [(b, s4 // 2, s4 // 2, 512)]),
        ("c5", Stage(3, 2048, 2), [(b, s4 // 4, s4 // 4, 1024)]),
        ("fpn", FPN(), [(b, s4, s4, 256), (b, s4 // 2, s4 // 2, 512),
                        (b, s4 // 4, s4 // 4, 1024),
                        (b, s4 // 8, s4 // 8, 2048)]),
        ("rpn", RPN(), [pyramid_shapes]),
    ]

    if a.only:
        keep = set(a.only.split(","))
        groups = [g for g in groups if g[0] in keep]
    rng = np.random.default_rng(0)
    for name, mdl, in_shapes in groups:
        try:
            if name == "rpn":
                xs = [[jnp.asarray(rng.uniform(-1, 1, sh), jnp.bfloat16)
                       for sh in in_shapes[0]]]
            else:
                xs = [jnp.asarray(rng.uniform(-1, 1, sh),
                                  jnp.float32 if name == "stem"
                                  else jnp.bfloat16)
                      for sh in in_shapes]
            params = mdl.init(jax.random.PRNGKey(0), *xs)
            params = cast_params_for_inference(params, policy)

            @jax.jit
            def step(params, xs, carry, i, mdl=mdl):
                xs = jax.tree.map(
                    lambda x: x + (1e-7 * (carry + i)).astype(x.dtype),
                    xs)
                out = mdl.apply(params, *xs)
                leaves = jax.tree.leaves(out)
                return sum((o.sum().astype(jnp.float32)
                            for o in leaves), jnp.float32(0))

            flops = bytes_acc = 0.0
            try:
                ca = step.lower(params, xs, jnp.float32(0),
                                jnp.float32(0)).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", 0.0))
                bytes_acc = float(ca.get("bytes accessed", 0.0))
            except Exception:
                pass

            t0 = time.perf_counter()
            _ = np.asarray(step(params, xs, jnp.float32(0),
                                jnp.float32(0)))
            compile_s = time.perf_counter() - t0

            def chain(n, mdl=mdl):
                c = jnp.float32(0)
                t0 = time.perf_counter()
                for i in range(n):
                    c = step(params, xs, c, jnp.float32(i + 1))
                _ = np.asarray(c)
                return time.perf_counter() - t0

            dtm, _ = _slope_time(chain, 2, 8)
            comp_ms = flops / 197e12 * 1e3
            hbm_ms = bytes_acc / 819e9 * 1e3
            floor = max(comp_ms, hbm_ms)
            rec = {"group": name, "platform": platform, "batch": b,
                   "ms_per_batch": round(dtm * 1e3, 2),
                   "tflops": round(flops / 1e12, 4),
                   "gbytes": round(bytes_acc / 1e9, 3),
                   "compute_bound_ms": round(comp_ms, 2),
                   "hbm_bound_ms": round(hbm_ms, 2),
                   "over_floor": round(dtm * 1e3 / floor, 2)
                   if floor else None,
                   "compile_s": round(compile_s, 1)}
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"group": name,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
