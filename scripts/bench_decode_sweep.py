"""Decode throughput vs batch size (slope-chained, see bench.py).

The 90-step LSTM decode is weight-streaming-bound at the reference's
batch 64: ~29.5 MB of bf16 decode weights re-read from HBM every step
(2.65 GB/invocation -> >=3.2 ms at 819 GB/s) versus ~2.1 ms of MXU
compute, so larger batches amortize the weight traffic. Batch 64 is
the BASELINE.md eval-parity point; this sweep finds the
max-throughput point.

Run single-flight on the chip:
  python scripts/bench_decode_sweep.py [--batches 64,128,256]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import V5E_BF16_PEAK, _decode_chain, _decode_loop_tflops, \
    _program_tflops, \
    _slope_time  # noqa: E402


def relay_up() -> bool:
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        return True
    except OSError:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,128,256")
    p.add_argument("--kernel", default="xla",
                   choices=["xla", "pallas", "pallas_interpret"],
                   help="speaker.decode_kernel: 'pallas' runs the whole "
                        "greedy loop as one VMEM-resident kernel "
                        "(models/pallas_decode.py)")
    p.add_argument("--pair_batch", action="store_true",
                   help="change_detector.pair_batch: bef/aft through "
                        "one [2B] relation-encoder pass")
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

    from ekaid_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    platform = jax.devices()[0].platform
    cfg = default_config()
    cfg = cfg.replace(speaker=cfg.speaker.replace(decode_kernel=a.kernel))
    if a.pair_batch:
        cfg = cfg.replace(change_detector=cfg.change_detector.replace(
            pair_batch=True))
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)

    if a.kernel != "xla":
        import numpy as np

        # EXACTNESS gate, f32 on-chip: interpret mode already proves the
        # kernel token-exact vs XLA at f32 (tests/test_pallas_decode.py)
        # but does not model Mosaic layout legality — this run proves the
        # HARDWARE-compiled kernel exact. bf16 token_match on random-init
        # weights is NOT a correctness verdict (near-uniform logits make
        # argmax ties common; both paths are valid bf16 roundings), so
        # correctness is settled here at f32 and bf16 is only recorded.
        gate_b = 8
        f32 = Policy(compute_dtype=jnp.float32)
        gb = jax.tree.map(jnp.asarray, synthetic_batch(cfg, gate_b, seed=0))
        m32_k = EkaidModel(cfg, ntoken=147, policy=f32)
        p32 = m32_k.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, gb, train=True)
        # PEAKED logits (VERDICT r3 do #1): random-init logits are
        # near-uniform, and on HARDWARE even f32 matmuls are not
        # bit-stable across backends (Mosaic and XLA pick their own
        # internal pass decompositions), so argmax ties flip tokens
        # without any kernel bug (measured: 21/720 at 1x). Scaling the
        # logit head 4x makes distributions trained-like-peaked; the
        # gate then demands token-exactness AND a tight numeric bound
        # on the chosen-token logprobs.
        p32 = jax.tree.map(lambda x: x, p32)          # fresh containers
        lg = p32["params"]["speaker"]["logit"]
        p32["params"]["speaker"]["logit"] = {
            k: v * 4.0 for k, v in lg.items()}
        m32_x = EkaidModel(cfg.replace(speaker=cfg.speaker.replace(
            decode_kernel="xla")), ntoken=147, policy=f32)
        # HIGHEST matmul precision on BOTH paths: XLA's DEFAULT f32 dot
        # on TPU runs bf16 passes while Mosaic's tpu.matmul does true
        # f32 — with default precision the two backends legitimately
        # diverge ~1e-1 in logprobs over 90 accumulated steps (r4d:
        # deterministic 21-token mismatch, NOT ties). At HIGHEST both
        # compute real f32 and token equality is a meaningful gate.
        with jax.default_matmul_precision("highest"):
            o_ref = m32_x.apply(p32, gb, method="decode",
                                sample_max=True)
            o_ker = m32_k.apply(p32, gb, method="decode",
                                sample_max=True)
        g_ref = np.asarray(o_ref["seq"])
        g_ker = np.asarray(o_ker["seq"])
        lp_ref = np.asarray(o_ref["logprobs"], np.float64)
        lp_ker = np.asarray(o_ker["logprobs"], np.float64)
        live = (g_ref > 0) | (g_ker > 0)
        # logprob deviation is only meaningful while the token PREFIX
        # still agrees — after a divergence the states legitimately
        # differ
        agree_prefix = np.cumprod(g_ref == g_ker, axis=1).astype(bool)
        pv = live & agree_prefix
        print(json.dumps({
            "gate": "f32_exactness_peaked", "kernel": a.kernel,
            "batch": gate_b, "logit_scale": 4.0,
            "precision": "highest",
            "seq_exact": bool((g_ref == g_ker).all()),
            "mismatch_tokens": int((g_ref != g_ker).sum()),
            "max_logprob_diff_agreeing_prefix": float(
                np.abs(lp_ref - lp_ker)[pv].max()
                if pv.any() else 0.0)}), flush=True)

        # bf16 agreement (informational — see gate above)
        b0 = int(a.batches.split(",")[0])
        batch0 = jax.tree.map(jnp.asarray, synthetic_batch(cfg, b0, seed=0))
        p0 = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch0,
                        train=True)
        p0 = cast_params_for_inference(p0, policy)
        m_ref = EkaidModel(cfg.replace(speaker=cfg.speaker.replace(
            decode_kernel="xla")), ntoken=147, policy=policy)
        s_ref = np.asarray(m_ref.apply(p0, batch0, method="decode",
                                       sample_max=True)["seq"])
        s_ker = np.asarray(model.apply(p0, batch0, method="decode",
                                       sample_max=True)["seq"])
        # match only over LIVE positions (either path still emitting);
        # both paths zero the post-EOS tail, so counting it would let a
        # wrong kernel pass the gate on tail agreement alone
        live = (s_ref > 0) | (s_ker > 0)
        n_live = max(int(live.sum()), 1)
        print(json.dumps({
            "kernel": a.kernel, "batch": b0,
            "token_match": round(
                float((s_ref == s_ker)[live].sum() / n_live), 4),
            "live_tokens": int(live.sum()),
            "seq_exact": bool((s_ref == s_ker).all())}), flush=True)

    params = None
    for b in [int(x) for x in a.batches.split(",")]:
        batch = jax.tree.map(jnp.asarray,
                             synthetic_batch(cfg, b, seed=0))
        if params is None:     # params are batch-independent
            params = model.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                batch, train=True)
            params = cast_params_for_inference(params, policy)
        try:
            dstep, run_chain = _decode_chain(
                model, params, batch, cfg.speaker.seq_length, b)
            tflops = _program_tflops(
                dstep, params, batch,
                jnp.zeros((b, cfg.speaker.seq_length), jnp.int32),
                jnp.float32(0))
            # cost_analysis counts the while body once (and the pallas
            # whole-loop kernel as ~zero) — add the loop's analytic
            # per-step matmul flops × trip count (bench.py)
            loop_tflops = _decode_loop_tflops(
                params, b, cfg.speaker.seq_length,
                counted_once=(cfg.speaker.decode_kernel != "pallas"))
            total = tflops + loop_tflops
            n_lo, n_hi = (10, 40) if platform != "cpu" else (1, 3)
            per, fixed = _slope_time(run_chain, n_lo, n_hi)
            rec = {"batch": b, "platform": platform,
                   "pairs_per_sec": round(b / per, 2),
                   "ms_per_invocation": round(per * 1e3, 3),
                   "program_tflops": round(total, 4),
                   "program_tflops_cost_analysis": round(tflops, 4),
                   "fixed_latency_ms": round(fixed * 1e3, 1)}
            if total > 0 and platform != "cpu":
                rec["mfu_pct"] = round(
                    100.0 * total * 1e12 / per / V5E_BF16_PEAK, 2)
        except Exception as e:
            rec = {"batch": b, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
