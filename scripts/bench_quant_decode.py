"""Int8 weight-streaming decode A/B (VERDICT r2 do #4).

The b64 decode sits ~1.8x above its streaming roofline: ~29.5 MB bf16
core weights re-read each of 90 scan steps dominate HBM traffic.
`speaker.weight_quant='int8'` (models/quant.py) streams the large core
kernels as per-channel int8, halving that term. This script measures,
on the same random-init flagship params:

  * baseline bf16 decode pairs/s + MFU (batch 64 and 128)
  * int8 decode pairs/s + MFU
  * output agreement: exact-token match rate and corpus BLEU-4 of the
    int8 answers against the bf16 answers over `--nbatches` synthetic
    batches (the eval-tolerance gate — BLEU ~1.0 means the metric
    pipeline cannot tell them apart)

Run single-flight (memory: axon-tpu-quirks):
  timeout 3600 python scripts/bench_quant_decode.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import V5E_BF16_PEAK, _program_tflops, _slope_time  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    p.add_argument("--nbatches", type=int, default=4,
                   help="synthetic batches for the agreement corpus")
    p.add_argument("--force_cpu", action="store_true")
    a = p.parse_args()

    if a.force_cpu:
        os.environ["EKAID_PLATFORM"] = "cpu"
    from ekaid_tpu.utils.platform import (apply_platform_env,
                                          enable_compile_cache)
    apply_platform_env()
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
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    qcfg = cfg.replace(speaker=cfg.speaker.replace(weight_quant="int8"))
    models = {"bf16": EkaidModel(cfg, ntoken=147, policy=policy),
              "int8": EkaidModel(qcfg, ntoken=147, policy=policy)}

    batch0 = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 64, seed=0))
    params = models["bf16"].init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, batch0, train=True)
    params = cast_params_for_inference(params, policy)

    # ---- throughput ----
    from bench import _decode_chain
    n_lo, n_hi = (10, 40) if platform == "tpu" else (1, 2)
    for bsz in a.batches:
        batch = jax.tree.map(jnp.asarray,
                             synthetic_batch(cfg, bsz, seed=0))
        for name, model in models.items():
            dstep, run_chain = _decode_chain(model, params, batch,
                                             cfg.speaker.seq_length, bsz)
            tflops = _program_tflops(
                dstep, params, batch,
                jnp.zeros((bsz, cfg.speaker.seq_length), jnp.int32),
                jnp.float32(0))
            per, _ = _slope_time(run_chain, n_lo, n_hi)
            rec = {"variant": name, "batch": bsz,
                   "pairs_per_sec": round(bsz / per, 1),
                   "ms_per_batch": round(per * 1e3, 2),
                   "tflops": round(tflops, 4), "platform": platform}
            if tflops > 0 and platform == "tpu":
                rec["mfu_pct"] = round(
                    100.0 * tflops * 1e12 / per / V5E_BF16_PEAK, 2)
            print(json.dumps(rec), flush=True)

    # ---- agreement corpus ----
    @jax.jit
    def dec_bf16(params, batch):
        return models["bf16"].apply(params, batch, method="decode",
                                    sample_max=True)["seq"]

    @jax.jit
    def dec_int8(params, batch):
        return models["int8"].apply(params, batch, method="decode",
                                    sample_max=True)["seq"]

    gts, res, match, total = {}, {}, 0, 0
    k = 0
    for i in range(a.nbatches):
        b = jax.tree.map(jnp.asarray, synthetic_batch(cfg, 64, seed=i))
        sa = np.asarray(dec_bf16(params, b))
        sb = np.asarray(dec_int8(params, b))
        match += int((sa == sb).sum())
        total += sa.size
        for r, h in zip(sa, sb):
            gts[str(k)] = [[str(t) for t in r if t > 0]]
            res[str(k)] = [str(t) for t in h if t > 0]
            k += 1

    from ekaid_tpu.metrics.caption import bleu
    scores, _ = bleu(gts, res)  # corpus [BLEU-1..4]
    print(json.dumps({
        "agreement_token_match_pct": round(100.0 * match / total, 2),
        "agreement_bleu4_int8_vs_bf16": round(float(scores[3]), 4),
        "corpus_pairs": k, "platform": platform}), flush=True)


if __name__ == "__main__":
    main()
