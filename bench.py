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
    program PLUS the analytic while-body flops × trip count
    (cost_analysis counts loop bodies once and pallas calls as zero —
    see _decode_loop_tflops; r1-r3 MFU fields carried that
    undercount), divided by measured step time, against v5e bf16 peak
    (197 TF/s).
  * fixed_latency_ms — the per-launch relay overhead the slope method
    cancels (see below).
  * platform — 'tpu' or 'cpu-fallback' (a wedged axon claim must not
    hang the driver; see memory/axon-tpu-quirks).

Timing methodology (slope-chained): on the axon relay BOTH
`block_until_ready` and repeated same-input loops lie — the relay acks
buffers before execution completes (a chained 8192² matmul loop read
"12,254 TF/s" under block_until_ready) and identical requests are
served from a result cache ("57,645 TF/s"). The only true sync point
is a device→host fetch. So every timed loop here (a) CHAINS requests —
iteration i+1 consumes iteration i's output plus a unique index scalar,
forcing serial on-device execution of unique programs — and (b) times
N_lo and N_hi chained iterations each ended by a tiny D2H fetch, taking
the slope (t_hi − t_lo)/(N_hi − N_lo) so the fixed fetch/roundtrip
latency (~30 ms) cancels. Calibration: the same 8192² matmul measures
184–188 TF/s = 93–95% of v5e bf16 peak under this method.

Both benches run RANDOM-INIT weights (static shapes only — throughput
is weight-value independent for these programs; the JSON says so via
"weights": "random-init").

vs_baseline: when BASELINE.json carries a measured same-host CPU anchor
(reference torch decode loop vs our jitted CPU decode — see
scripts/bench_baseline_torch.py), the ratio is reported; otherwise null
(the reference publishes no numbers and its GPU pipeline cannot run
here).
"""

from __future__ import annotations

import argparse
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
    """XLA's own FLOP estimate for one invocation, in TFLOP.

    CAVEAT: cost_analysis counts a `while` body ONCE regardless of trip
    count, and a pallas custom call as ~zero — for the scan-dominated
    decode/train programs this is the ENCODER's flops only. Use
    _decode_loop_tflops to supplement (BENCH r1-r3 MFU fields carried
    this undercount: b64 decode reported 33-36% where the true figure
    is ~50%)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / 1e12
    except Exception:
        return 0.0


def _decode_loop_tflops(params, batch_size: int, steps: int,
                        counted_once: bool = False) -> float:
    """Analytic matmul FLOPs of the decode loop's serial steps, TFLOP.

    Verified against the program: cost_analysis(decode program, XLA
    while path) − cost_analysis(encoder alone) ≈ one loop body; the
    pallas whole-loop kernel reports ~zero. Per step the body applies
    every 2-D kernel under speaker.core (two LSTM cells, the dynamic
    attention/gate/pos stack) plus the logit head: flops =
    2·B·Σ(in·out), ≈1.87 GFLOP at b64 flagship dims — ×90 steps that
    is 0.168 TFLOP, 40% of the true program, all invisible to
    cost_analysis. Word-embedding lookup, biases and the LSTM
    elementwise gates are <0.5% and omitted. Greedy early exit can
    shorten the loop on trained weights; benches run random-init where
    all `steps` execute, and this is the figure MFU divides by.
    `counted_once=True` (the XLA while path) drops the one body
    cost_analysis already counted; a weight-norm {v,g} pair counts its
    v kernel once."""
    def body_kernel_flops(node):
        if hasattr(node, "keys"):
            keys = set(node.keys())
            if ("v" in keys and "g" in keys and keys <= {"v", "g", "bias"}
                    and getattr(node["v"], "ndim", None) == 2):
                return 2 * node["v"].shape[0] * node["v"].shape[1]
            return sum(body_kernel_flops(v) for v in node.values())
        if getattr(node, "ndim", None) == 2:
            return 2 * node.shape[0] * node.shape[1]
        return 0

    speaker = params["params"]["speaker"]
    per_step = batch_size * sum(
        body_kernel_flops(speaker[k]) for k in ("core", "logit")
        if k in speaker)
    trips = steps - 1 if counted_once else steps
    return per_step * max(trips, 0) / 1e12


def _slope_time(run_chain, n_lo: int, n_hi: int, repeats: int = 2):
    """Seconds/iteration via the slope of chained-run wall clock.

    run_chain(n) must execute n serially-dependent device steps and end
    with a tiny device→host fetch. Runs `repeats` (lo, hi) pairs and
    keeps the SMALLEST positive slope among pairs with a PLAUSIBLE
    intercept — relay congestion only ever adds time, so the fastest
    pair is the least-contended estimate (observed 2x-slow outlier
    pairs on a busy relay). Returns (sec_per_iter, fixed_latency_sec).

    Intercept plausibility (r5 hardening): the relay's true fixed
    roundtrip is ~30-100 ms. When the SHORT chain alone hits
    congestion, the fit shows up as a huge positive intercept and an
    OPTIMISTIC slope — the one failure mode min-of-pairs amplifies
    instead of rejects (r5b train_pair_b128: fixed 532 ms, slope 2.1x
    fast, nearly flipped a default on a fiction). Pairs with
    fixed > 250 ms are now demoted with the negative-intercept ones;
    if every pair is implausible, fall back to the longest chain's
    average (a mild overestimate of sec/iter, never a fiction)."""
    FIXED_CAP_S = 0.25
    best = None
    for _ in range(max(1, repeats)):
        t_lo = run_chain(n_lo)
        t_hi = run_chain(n_hi)
        per = (t_hi - t_lo) / (n_hi - n_lo)
        fixed = t_lo - n_lo * per
        # a clamped-negative intercept means the pair was nonlinear
        # (congestion mid-chain); a too-large one means the short chain
        # was congested — prefer pairs with a sane intercept
        key = (fixed < 0 or fixed > FIXED_CAP_S, per)
        if per > 0 and (best is None or key < best[0]):
            best = (key, per, max(fixed, 0.0))
    if best is None or best[0][0]:
        # every pair was nonlinear (hard congestion): the conservative
        # average of the longest chain — never a negative/fast fiction
        return t_hi / n_hi, 0.0
    return best[1], best[2]


def _decode_chain(model, params, batch, seq_len, batch_size):
    """Chained decode step: d_feats perturbed by the previous seq and a
    unique index so every request is distinct and serially dependent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def dstep(params, batch, carry, i):
        feedback = (carry.sum(-1, keepdims=True).astype(jnp.float32) + i)
        batch = dict(batch, d_feats=batch["d_feats"]
                     + 1e-6 * feedback[:, :, None])
        seq = model.apply(params, batch, method="decode",
                          sample_max=True)["seq"]
        return seq

    zero = jnp.zeros((batch_size, seq_len), jnp.int32)
    carry = dstep(params, batch, zero, jnp.float32(0))   # compile+warm
    _ = np.asarray(carry[0, 0])

    def run_chain(n):
        carry = zero
        t0 = time.perf_counter()
        for i in range(n):
            carry = dstep(params, batch, carry, jnp.float32(i + 1))
        _ = np.asarray(carry[0, 0])
        return time.perf_counter() - t0

    return dstep, run_chain


def bench_qa(platform: str, variants: bool = False,
             batch_size: int | None = None):
    import jax
    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    cfg = default_config()
    from ekaid_tpu.utils.platform import resolve_decode_kernel
    cfg = cfg.replace(speaker=cfg.speaker.replace(
        decode_kernel=resolve_decode_kernel(cfg.speaker.decode_kernel)))
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)

    if batch_size is None:
        batch_size = cfg.data.test.batch_size      # 64, eval parity
    batch = jax.tree.map(jnp.asarray,
                         synthetic_batch(cfg, batch_size, seed=0))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    # decode-only bf16 weight copy: halves per-step HBM weight reads
    # (same rounding as the per-use cast -> identical outputs)
    params = cast_params_for_inference(params, policy)

    dstep, run_chain = _decode_chain(model, params, batch,
                                     cfg.speaker.seq_length, batch_size)
    tflops = _program_tflops(
        dstep, params, batch,
        jnp.zeros((batch_size, cfg.speaker.seq_length), jnp.int32),
        jnp.float32(0))
    loop_tflops = _decode_loop_tflops(
        params, batch_size, cfg.speaker.seq_length,
        counted_once=(cfg.speaker.decode_kernel != "pallas"))

    if platform == "tpu":
        # slope-chained: cancels the ~30-60 ms relay roundtrip (axon
        # acks buffers before execution; see STATUS round-2 notes)
        n_lo, n_hi = 10, 40
        per, fixed = _slope_time(run_chain, n_lo, n_hi)
    else:
        # cpu-fallback: plain steady-state average, the SAME estimator
        # as the BASELINE.json torch-CPU anchor (bench_baseline_torch)
        # — a slope fit here soaks one-time lazy AOT loads into a
        # fictional multi-second "fixed latency" and inflates the rate,
        # making vs_baseline a cross-protocol lie
        run_chain(1)                      # absorb lazy init
        per, fixed = run_chain(3) / 3, 0.0

    total_tflops = tflops + loop_tflops
    out = {"pairs_per_sec": batch_size / per,
           "decode_tflops": round(total_tflops, 4),
           "decode_tflops_cost_analysis": round(tflops, 4),
           "decode_loop_tflops": round(loop_tflops, 4),
           "fixed_latency_ms": round(fixed * 1e3, 1)}
    if total_tflops > 0 and platform == "tpu":
        out["mfu_pct"] = round(100.0 * total_tflops * 1e12 / per
                               / V5E_BF16_PEAK, 2)

    if variants and platform == "tpu":
        # A/B the decode-step variants (same params, proven-equal
        # outputs — tests/test_model.py); results steer which knobs the
        # next round turns on by default
        # variants A/B the XLA scan knobs — pin decode_kernel back to
        # xla (fused_core/scan_unroll rewrite the XLA step and refuse
        # to compose with the pallas whole-loop kernel)
        xsp = cfg.speaker.replace(decode_kernel="xla")
        for name, sp in [
                ("fused", xsp.replace(fused_core=True)),
                ("unroll2", xsp.replace(scan_unroll=2)),
                ("unroll4", xsp.replace(scan_unroll=4)),
                ("fused_unroll2", xsp.replace(fused_core=True,
                                              scan_unroll=2))]:
            mv = EkaidModel(cfg.replace(speaker=sp), ntoken=147,
                            policy=policy)
            try:
                _, run_v = _decode_chain(mv, params, batch,
                                         cfg.speaker.seq_length,
                                         batch_size)
                per_v, _ = _slope_time(run_v, n_lo, n_hi)
                out[f"pairs_per_sec_{name}"] = round(batch_size / per_v,
                                                     2)
            except Exception as e:
                out[f"pairs_per_sec_{name}"] = f"{type(e).__name__}"
    return out


def bench_extract(platform: str):
    """Anatomy-extraction steady state at the full 1024² geometry,
    slope-chained like bench_qa (images perturbed by the previous
    feature sum + index)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ekaid_tpu.config import default_config
    from ekaid_tpu.extract.runner import build_detector_fns

    cfg = default_config()
    # the reference's Detectron2 R50-FPN runs FrozenBN (every shipped
    # checkpoint; our converter plumbs it via --norm frozen_bn), so
    # the extraction bench measures that deployment configuration —
    # GN is the from-scratch-training default only. Measured at b8:
    # frozen_bn 61.1 ms vs GN 66.9 ms (the GN stats passes cost
    # ~10 ms of extra HBM traffic in the backbone).
    cfg = cfg.replace(detector=cfg.detector.replace(norm="frozen_bn"))
    det = cfg.detector
    ana_apply, _ = build_detector_fns(cfg)
    b = det.extract_batch_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 1, (b, det.image_size, det.image_size, 3)),
        jnp.float32)

    apply_fn = getattr(ana_apply, "__wrapped__", ana_apply)

    @jax.jit
    def estep(images, carry, i):
        images = images + 1e-7 * (carry + i)
        return apply_fn(images)["features"].sum().astype(jnp.float32)

    carry = estep(images, jnp.float32(0), jnp.float32(0))  # compile
    _ = np.asarray(carry)

    def run_chain(n):
        carry = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(n):
            carry = estep(images, carry, jnp.float32(i + 1))
        _ = np.asarray(carry)
        return time.perf_counter() - t0

    tflops = _program_tflops(estep, images, jnp.float32(0),
                             jnp.float32(0))

    per, fixed = _slope_time(run_chain, 2, 8)
    out = {"images_per_sec": b / per, "batch_size": b,
           "tflops": round(tflops, 4),
           "fixed_latency_ms": round(fixed * 1e3, 1)}
    if tflops > 0 and platform == "tpu":
        out["mfu_pct"] = round(100.0 * tflops * 1e12 / per
                               / V5E_BF16_PEAK, 2)
    return out


def bench_train(platform: str, batch_size: int = 128,
                bucket: int = 48):
    """Train-step throughput at the measured-best supported operating
    point (b128 + answer-length bucket 48, STATUS r4d) with the shipped
    config defaults. Same slope chaining as bench_qa; mirror of
    scripts/bench_train.py kept inline so the driver bench holds one
    device claim."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.pipeline import trim_batch_to_bucket
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.train.step import (init_state, make_optimizer,
                                      train_step)
    from ekaid_tpu.utils.dtypes import Policy, canonical

    cfg = default_config()
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)
    tx = make_optimizer(cfg.train.optim)
    host_batch = trim_batch_to_bucket(
        synthetic_batch(cfg, batch_size, seed=0), (bucket,),
        cfg.speaker.seq_length)
    scan_t = host_batch["labels"].shape[1] - 1
    batch = jax.tree.map(jnp.asarray, host_batch)
    state = init_state(model, tx, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    step = jax.jit(partial(train_step, model, tx,
                           cfg.train.att_reg_weight, ss_prob=0.0),
                   donate_argnums=(0,))
    tflops = _program_tflops(step, state, batch, rng)
    # + the while-body trips cost_analysis omits (fwd body counted
    # once; bwd ~2x fwd — see scripts/bench_train.py)
    loop_tflops = _decode_loop_tflops(state.params, batch_size,
                                      steps=1) * 3 * max(scan_t - 1, 0)
    state, metrics = step(state, batch, rng)
    _ = np.asarray(metrics["total_loss"])

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, rng)
        _ = np.asarray(metrics["total_loss"])
        return time.perf_counter() - t0

    per, _fixed = _slope_time(chain, 5, 20)
    out = {"train_pairs_per_sec": round(batch_size / per, 2),
           "train_ms_per_step": round(per * 1e3, 2),
           "train_batch": batch_size, "train_scan_steps": scan_t,
           "train_pair_batch": cfg.change_detector.pair_batch}
    total = tflops + loop_tflops
    if total > 0 and platform == "tpu":
        out["train_mfu_pct"] = round(100.0 * total * 1e12 / per
                                     / V5E_BF16_PEAK, 2)
    return out


def _vs_baseline(pairs_per_sec: float, platform: str):
    """Ratio vs the measured same-host CPU anchor in BASELINE.json
    (reference torch greedy-decode loop, identical batch/shapes —
    scripts/bench_baseline_torch.py records it). Only meaningful as a
    software-efficiency anchor; it is NOT the reference's GPU number.
    CPU-vs-CPU compares like for like; the TPU number is reported
    against the same CPU anchor with the platform field making the
    hardware delta explicit."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    try:
        with open(path) as f:
            measured = json.load(f).get("measured", {})
        anchor = measured["torch_cpu_decode_pairs_per_sec"]
        return round(pairs_per_sec / float(anchor), 2)
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", action="store_true",
                    help="also A/B fused_core/scan_unroll decode "
                         "variants (extra multi-minute compiles)")
    a = ap.parse_args()

    t_start = time.perf_counter()
    platform = "tpu"
    if not _tpu_responsive():
        import os
        os.environ["EKAID_PLATFORM"] = "cpu"
        platform = "cpu-fallback"

    from ekaid_tpu.utils.platform import apply_platform_env, \
        enable_compile_cache
    apply_platform_env()
    enable_compile_cache()     # decode compile is minutes on axon

    qa = bench_qa(platform, variants=a.variants)
    t_b64 = time.perf_counter() - t_start
    record = {
        "metric": "qa_pairs_per_sec_per_chip",
        "value": round(qa["pairs_per_sec"], 2),
        "unit": "pairs/s",
        "vs_baseline": _vs_baseline(qa["pairs_per_sec"], platform),
        "vs_baseline_note": ("ratio vs measured same-host reference "
                             "torch-CPU decode anchor (BASELINE.json "
                             ".measured) — software anchor, not the "
                             "reference GPU"),
        "platform": platform,
        "weights": "random-init",
        "decode_tflops": qa["decode_tflops"],
        "decode_tflops_cost_analysis": qa["decode_tflops_cost_analysis"],
        "decode_loop_tflops": qa["decode_loop_tflops"],
        "mfu_note": ("decode_tflops = cost_analysis + analytic "
                     "while-body flops × 90 steps (cost_analysis "
                     "counts loop bodies once / pallas calls as zero; "
                     "r1-r3 MFU fields carried that undercount — see "
                     "docs/perf/BOUNDS.md)"),
        "fixed_latency_ms": qa["fixed_latency_ms"],
    }
    for k, v in qa.items():
        if k.startswith("pairs_per_sec_") or k == "mfu_pct":
            record[k] = v
    # serving-scale operating point: batch 128 is the measured MFU
    # sweet spot (64% vs ~50% at eval-parity 64; greedy decode is
    # proven batch-invariant, tests/test_model.py) and is what the
    # coalescing server runs at load. Runs RIGHT AFTER b64 — an
    # elapsed-since-start guard placed after the extract/loader phases
    # tripped on relay/host contention even with a warm cache (r4f:
    # 697s elapsed, skipped). Gate instead on the b64 phase's own wall
    # time: warm b128 costs about the same as warm b64, so a cold-cache
    # driver run (b64 > 420s: multi-minute remote compile) still never
    # risks its timeout on a second cold compile.
    # b128 is ALWAYS attempted up to a 2400s elapsed cap (VERDICT r4
    # weak #1: the old warm-only gate dropped the measured-best
    # operating point from the official record whenever the driver ran
    # on a cold/migrated host — the repo-local cache makes that rare,
    # but a VM migration changes the host fingerprint and recompiles).
    # Worst case with a cold b64 (~1400s) + cold b128 (~1400s) is
    # ~47 min, which the r4 driver demonstrably waited out; a warm run
    # reaches here in ~200s and pays ~100s more.
    if platform == "tpu" and time.perf_counter() - t_start < 2400:
        try:
            qa128 = bench_qa(platform, batch_size=128)
            record["pairs_per_sec_b128"] = round(
                qa128["pairs_per_sec"], 2)
            if "mfu_pct" in qa128:
                record["mfu_pct_b128"] = qa128["mfu_pct"]
            if t_b64 >= 420:
                record["b128_note"] = (
                    f"compiled cold (b64 phase {t_b64:.0f}s) — attempted "
                    f"anyway per VERDICT r4 #1")
        except Exception as e:
            record["b128_error"] = f"{type(e).__name__}: {e}"
    elif platform == "tpu":
        # self-describing skip (ADVICE r3): downstream consumers must be
        # able to tell 'guard tripped' from 'not attempted'.
        record["b128_skipped"] = (
            f"time-guard ({time.perf_counter() - t_start:.0f}s elapsed "
            f">= 2400s before the b128 attempt)")
    if platform == "tpu":
        try:
            ext = bench_extract(platform)
            record["extract_images_per_sec"] = round(
                ext["images_per_sec"], 2)
            record["extract_batch_size"] = ext["batch_size"]
            record["extract_tflops"] = ext["tflops"]
            if "mfu_pct" in ext:
                record["extract_mfu_pct"] = ext["mfu_pct"]
        except Exception as e:       # extraction must not kill the line
            record["extract_error"] = f"{type(e).__name__}: {e}"
    # honest best operating point across everything measured this run
    best = max((v for k, v in record.items()
                if k.startswith("pairs_per_sec") and
                isinstance(v, (int, float))),
               default=None)
    if best is not None and isinstance(record.get("value"), (int, float)):
        record["pairs_per_sec_best"] = max(best, record["value"])
    try:
        record["loader_pairs_per_sec"] = _bench_loader()
    except Exception as e:           # host-IO bench must not kill it
        record["loader_error"] = f"{type(e).__name__}: {e}"
    # end-to-end eval rate (loader -> decode -> detokenize, overlapped;
    # test_mimic.py:136-137 parity) — the number a user actually gets,
    # with the host wall included. Inline (this process already holds
    # the device claim); time-guarded like b128.
    # 1800s budget: with the b128 phase now ahead of it, a fully warm
    # run reaches this point at ~900-1100s under relay/host contention
    # (r4f verify: 697s for b64+extract alone); e2e itself costs ~60s
    # warm and reuses the b64 decode executable, so the only cold risk
    # it adds is its own small host-side program.
    if platform == "tpu" and time.perf_counter() - t_start < 1800:
        try:
            import os
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts"))
            from bench_e2e import run_e2e
            # device_cache mirrors the shipped eval default
            # (config.data.eval_device_cache): only miss rows +
            # question tokens cross the wire (data/device_cache.py).
            # The fixture re-asks questions about 512 study pairs, so
            # the steady-state epoch is hit-dominated — like MIMIC's
            # ~4.3 questions/pair eval set. Stats land in the record.
            e2e = run_e2e(batch_size=64, pairs=1664, device_cache=1024)
            record["e2e_pairs_per_sec"] = e2e["e2e_pairs_per_sec"]
            record["e2e_wire"] = e2e.get("wire", "f32")
            if "cache_stats" in e2e:
                record["e2e_cache_hit_rate"] = round(
                    e2e["cache_stats"]["hit_rate"], 4)
        except Exception as e:
            record["e2e_error"] = f"{type(e).__name__}: {e}"
    elif platform == "tpu":
        record["e2e_skipped"] = (
            f"time-guard ({time.perf_counter() - t_start:.0f}s elapsed "
            f">= 1800s budget before the e2e attempt)")
    # train-step throughput at the shipped best operating point
    # (b128+bkt48, pair_batch='train'). Last phase: its compile is
    # ~330s cold, so the guard only admits it when the run still has
    # budget (warm runs reach here in ~300-1200s; a fully cold driver
    # run skips it with the self-describing field).
    if platform == "tpu" and time.perf_counter() - t_start < 2400:
        try:
            tr = bench_train(platform)
            record.update(tr)
        except Exception as e:
            record["train_error"] = f"{type(e).__name__}: {e}"
    elif platform == "tpu":
        record["train_skipped"] = (
            f"time-guard ({time.perf_counter() - t_start:.0f}s elapsed "
            f">= 2400s before the train attempt)")
    if platform == "cpu-fallback":
        # a wedged chip / dead relay at record time must not erase the
        # round's real hardware data: embed the last on-chip numbers,
        # clearly labeled as a replay with provenance (maintained from
        # the session's single-flight queue runs)
        try:
            import os
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "docs", "perf", "last_tpu_bench.json")) as f:
                record["last_tpu"] = json.load(f)
            record["last_tpu_note"] = (
                "REPLAY of the most recent on-chip measurements (see "
                "last_tpu.sources) — NOT measured in this run; the "
                "chip/relay was unreachable at record time")
        except Exception:
            pass
    print(json.dumps(record))


def _bench_loader() -> float:
    """Host data-loader throughput (CPU-only, reference HDF5 layout) —
    the end-to-end feed rate cap; see scripts/bench_loader.py. Runs in
    a subprocess so a loader failure can't take down the bench line."""
    import os
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts", "bench_loader.py"),
         "--images", "128", "--pairs", "768", "--threads", "-1",
         "--h5", "/tmp/bench_loader_small.hdf5"],
        capture_output=True, text=True, timeout=600, check=True,
        env={**os.environ, "EKAID_PLATFORM": "cpu"})
    row = json.loads(out.stdout.strip().splitlines()[-1])
    return row["pairs_per_sec"]


if __name__ == "__main__":
    main()
