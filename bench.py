"""North-star benchmarks: QA pairs/sec/chip + extraction images/sec/chip.

Primary metric (the printed JSON line): QA pairs/sec on the
MIMIC-Diff-VQA workload — the flagship model (full-size dims from the
shipped config: 52 nodes × 1024-d, 4-head GAT over 3 relation graphs,
90-step LSTM decode, batch 64 — BASELINE.md workload table) through the
batched greedy-decode path (test_mimic.py:92-124 parity).

Extra fields on the same line:
  * extract_images_per_sec — the second north-star (BASELINE.md):
    batched anatomy extraction at 1024² (reference anchor: batch-1
    hooked loop, ana_bbox_generator.py:557-621). TPU runs only — the
    1024² R50-FPN is pointless to time on the CPU fallback.
  * decode_tflops / mfu_pct — XLA cost-analysis FLOPs for the decode
    program divided by wall-clock, against v5e bf16 peak (197 TF/s).
  * platform — 'tpu' or 'cpu-fallback' (a wedged axon claim must not
    hang the driver; see memory/axon-tpu-quirks).

Timing methodology: the axon relay DEDUPS identical execution requests
(same executable + same input buffers → cached result in ~0.02 ms,
measured 8192² matmul "57,645 TF/s"), so every timed loop here rotates
distinct input batches; with rotation the same matmul probe lands at
160 TF/s = 81% of v5e peak, which is believable. Any axon timing loop
that reuses one input is measuring the relay's cache, not the chip.

vs_baseline is null: the reference publishes no numbers (BASELINE.json
"published": {}), and the reference GPU pipeline cannot run here.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
import time

V5E_BF16_PEAK = 197e12


def _relay_up(port: int = 8083, timeout_s: float = 3.0) -> bool:
    """The axon relay serves jax.devices() via 127.0.0.1:8083; when it
    is down (connection refused) every device query hangs — check the
    socket first so a dead relay fails in milliseconds, not minutes."""
    try:
        with socket.create_connection(("127.0.0.1", port),
                                      timeout=timeout_s):
            return True
    except OSError:
        return False


def _tpu_responsive(timeout_s: float = 120.0) -> bool:
    """Probe device init in a child process: a wedged axon claim makes
    jax.devices() hang indefinitely (see memory: axon-tpu-quirks); a
    hang in the child is just a timeout here."""
    if not _relay_up():
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=timeout_s)
        return b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _program_tflops(jitted, *args) -> float:
    """XLA's own FLOP estimate for one invocation, in TFLOP."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / 1e12
    except Exception:
        return 0.0


def bench_qa(platform: str):
    import jax
    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.utils.dtypes import Policy, canonical

    cfg = default_config()
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)

    batch_size = cfg.data.test.batch_size          # 64, eval parity
    n_rot = 4 if platform == "tpu" else 1          # defeat relay dedup
    batches = [jax.tree.map(jnp.asarray,
                            synthetic_batch(cfg, batch_size, seed=s))
               for s in range(n_rot)]
    batch = batches[0]
    from ekaid_tpu.utils.dtypes import cast_params_for_inference
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    # decode-only bf16 weight copy: halves per-step HBM weight reads
    # (same rounding as the per-use cast -> identical outputs)
    params = cast_params_for_inference(params, policy)

    @jax.jit
    def decode(params, batch):
        return model.apply(params, batch, method="decode",
                           sample_max=True)["seq"]

    jax.block_until_ready(decode(params, batch))   # compile + warmup
    tflops = _program_tflops(decode, params, batch)

    iters = 20 if platform == "tpu" else 2
    t0 = time.perf_counter()
    for i in range(iters):
        seq = decode(params, batches[i % n_rot])
    jax.block_until_ready(seq)
    dt = time.perf_counter() - t0

    out = {"pairs_per_sec": batch_size * iters / dt,
           "decode_tflops": round(tflops, 4)}
    if tflops > 0 and platform == "tpu":
        out["mfu_pct"] = round(100.0 * tflops * 1e12 * iters / dt
                               / V5E_BF16_PEAK, 2)

    if platform == "tpu":
        # A/B the decode-step variants (same params, proven-equal
        # outputs — tests/test_model.py); results steer which knobs the
        # next round turns on by default
        for name, sp in [
                ("fused", cfg.speaker.replace(fused_core=True)),
                ("fused_unroll2", cfg.speaker.replace(fused_core=True,
                                                      scan_unroll=2))]:
            mv = EkaidModel(cfg.replace(speaker=sp), ntoken=147,
                            policy=policy)

            @jax.jit
            def dec_v(params, batch, mv=mv):
                return mv.apply(params, batch, method="decode",
                                sample_max=True)["seq"]

            try:
                jax.block_until_ready(dec_v(params, batch))
                t0 = time.perf_counter()
                for i in range(iters):
                    seq = dec_v(params, batches[i % n_rot])
                jax.block_until_ready(seq)
                out[f"pairs_per_sec_{name}"] = round(
                    batch_size * iters / (time.perf_counter() - t0), 2)
            except Exception as e:
                out[f"pairs_per_sec_{name}"] = f"{type(e).__name__}"
    return out


def bench_extract(platform: str, iters: int = 4):
    """Anatomy-extraction steady state at the full 1024² geometry."""
    import jax
    import numpy as np
    from ekaid_tpu.config import default_config
    from ekaid_tpu.extract.runner import build_detector_fns

    cfg = default_config()
    det = cfg.detector
    ana_apply, _ = build_detector_fns(cfg)
    b = det.batch_size
    rng = np.random.default_rng(0)
    n_rot = 2                                      # defeat relay dedup
    imgs = [jax.numpy.asarray(
        rng.uniform(0, 1, (b, det.image_size, det.image_size, 3)),
        jax.numpy.float32) for _ in range(n_rot)]
    jax.block_until_ready(ana_apply(imgs[0])["features"])   # compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = ana_apply(imgs[i % n_rot])
    jax.block_until_ready(out["features"])
    dt = time.perf_counter() - t0
    return {"images_per_sec": b * iters / dt, "batch_size": b}


def main():
    platform = "tpu"
    if not _tpu_responsive():
        import os
        os.environ["EKAID_PLATFORM"] = "cpu"
        platform = "cpu-fallback"

    from ekaid_tpu.utils.platform import apply_platform_env, \
        enable_compile_cache
    apply_platform_env()
    enable_compile_cache()     # decode compile is minutes on axon

    qa = bench_qa(platform)
    record = {
        "metric": "qa_pairs_per_sec_per_chip",
        "value": round(qa["pairs_per_sec"], 2),
        "unit": "pairs/s",
        "vs_baseline": None,
        "platform": platform,
        "decode_tflops": qa["decode_tflops"],
    }
    for k, v in qa.items():
        if k.startswith("pairs_per_sec_") or k == "mfu_pct":
            record[k] = v
    if platform == "tpu":
        try:
            ext = bench_extract(platform)
            record["extract_images_per_sec"] = round(
                ext["images_per_sec"], 2)
            record["extract_batch_size"] = ext["batch_size"]
        except Exception as e:       # extraction must not kill the line
            record["extract_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
