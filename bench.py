"""North-star benchmark: QA pairs/sec/chip on the MIMIC-Diff-VQA workload.

Runs the flagship model (full-size dims from the shipped config: 52 nodes
× 1024-d, 4-head GAT over 3 relation graphs, 90-step LSTM decode, batch
64 — BASELINE.md workload table) through the batched greedy-decode path
(test_mimic.py:92-124 parity) on the available accelerator and prints one
JSON line.

vs_baseline is null: the reference publishes no numbers (BASELINE.json
"published": {}), and the reference GPU pipeline cannot run here.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def _tpu_responsive(timeout_s: float = 120.0) -> bool:
    """Probe device init in a child process: a wedged axon claim makes
    jax.devices() hang indefinitely (see memory: axon-tpu-quirks), which
    would hang the whole benchmark. A hang in the child is just a
    timeout here."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=timeout_s)
        return b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    platform = "tpu"
    if not _tpu_responsive():
        # fall back to CPU rather than hanging the driver
        import os
        os.environ["EKAID_PLATFORM"] = "cpu"
        platform = "cpu-fallback"

    import jax
    import jax.numpy as jnp
    from ekaid_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.utils.dtypes import Policy, canonical

    cfg = default_config()
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)

    batch_size = cfg.data.test.batch_size          # 64, eval parity
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size,
                                                      seed=0))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)

    @jax.jit
    def decode(params, batch):
        return model.apply(params, batch, method="decode",
                           sample_max=True)["seq"]

    # compile + warmup
    jax.block_until_ready(decode(params, batch))

    iters = 20 if platform == "tpu" else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        seq = decode(params, batch)
    jax.block_until_ready(seq)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch_size * iters / dt
    print(json.dumps({
        "metric": "qa_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": None,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
