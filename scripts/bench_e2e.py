"""End-to-end eval throughput: loader → decode → detokenize, overlapped.

The number a user actually gets from `ekaid-test` — NOT the device-only
decode rate: host HDF5 reads, H2D transfer, the 90-step greedy decode,
D2H fetch and detokenization all run concurrently exactly as
Trainer.evaluate pipelines them (enqueue batch i+1, then flush batch i).
Reference anchor: test_mimic.py:136-137 times this same wall-clock loop.

Timing is plain wall clock over N steady-state batches with every
batch's tokens materialized on host (np.asarray is the only true sync
on axon — see bench.py). Executions are serial on-device, so total
time >= total device time; each batch is distinct data (no relay
result-cache aliasing). The warmup epoch absorbs compile + page cache.

Run single-flight on the chip:
  python scripts/bench_e2e.py [--batch 64] [--pairs 1664]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _relay_up  # noqa: E402
from bench_loader import ensure_fixture, fixture_dataset  # noqa: E402


def run_e2e(batch_size: int = 64, pairs: int = 1664,
            images: int = 512, threads: int = -1,
            h5_path: str = "/tmp/bench_loader_feats.hdf5",
            wire: str = "compact", device_cache: int = 0) -> dict:
    """Returns {'e2e_pairs_per_sec': ..., ...}. Call with the device
    already claimed by this process (bench.py) or standalone."""
    import jax
    import jax.numpy as jnp
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.pipeline import Loader
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.train.train import identity_vocab
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    cfg = default_config()
    ensure_fixture(h5_path, images, cfg)
    ds = fixture_dataset(cfg, h5_path, pairs, images,
                         vocab_size=cfg.speaker.vocab_size)
    vocab = identity_vocab(cfg.speaker.vocab_size)
    if threads < 0:
        threads = cfg.data.num_workers
    loader = Loader(ds, batch_size=batch_size, shuffle=True, seed=0,
                    num_threads=threads, prefetch=cfg.data.prefetch,
                    wire=wire)

    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)
    first = next(iter(loader))
    dev_first = {k: jnp.asarray(v) for k, v in first.items()
                 if k != "pair_index"}
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        dev_first, train=True)
    params = cast_params_for_inference(params, policy)

    @jax.jit
    def decode(params, b):
        return model.apply(params, b, method="decode",
                           sample_max=True)["seq"]

    cache = None
    if device_cache:
        # device-resident per-image cache (VERDICT r4 #6): only miss
        # rows + question tokens cross the wire; see data/device_cache
        from ekaid_tpu.data.device_cache import DeviceEvalCache
        cache = DeviceEvalCache(ds, capacity=device_cache)

        @jax.jit
        def decode_cached(params, dev, d_slots, q_slots, question):
            b = DeviceEvalCache.gather_batch(dev, d_slots, q_slots,
                                             question)
            return model.apply(params, b, method="decode",
                               sample_max=True)["seq"]

    def epoch(time_it: bool):
        """One full pipelined epoch; returns (pairs_done, seconds,
        sentences_detokenized)."""
        n_done, n_sent = 0, 0
        pending = None
        t0 = time.perf_counter()
        if cache is not None:
            for idxs in loader._batch_indices():
                d_slots, q_slots = cache.ensure(idxs)
                nxt = decode_cached(
                    params, cache.dev_arrays(), jnp.asarray(d_slots),
                    jnp.asarray(q_slots),
                    jnp.asarray(ds.questions[idxs].astype(np.int32)))
                if pending is not None:
                    seqs = np.asarray(pending)  # true sync: D2H fetch
                    n_sent += len(vocab.decode_batch(seqs))
                pending = nxt
                n_done += len(idxs)
        else:
            for b in loader:
                dev = {k: jnp.asarray(v) for k, v in b.items()
                       if k != "pair_index"}
                nxt = decode(params, dev)       # enqueue (async dispatch)
                if pending is not None:
                    seqs = np.asarray(pending)  # true sync: D2H fetch
                    n_sent += len(vocab.decode_batch(seqs))
                pending = nxt
                n_done += b["d_feats"].shape[0]
        if pending is not None:
            seqs = np.asarray(pending)
            n_sent += len(vocab.decode_batch(seqs))
        return n_done, time.perf_counter() - t0, n_sent

    epoch(False)                                 # warm: compile + cache
    n, dt, n_sent = epoch(True)
    import jax as _jax
    out = {
        "e2e_pairs_per_sec": round(n / dt, 1),
        "pairs": n, "sentences": n_sent, "batch": batch_size,
        "wire": wire, "loader_threads": threads,
        "platform": _jax.devices()[0].platform,
        "seconds": round(dt, 2),
        "note": ("loader->decode->detokenize overlapped; every batch's "
                 "tokens fetched to host (test_mimic.py:136-137 parity)"),
    }
    if cache is not None:
        out["device_cache"] = device_cache
        out["cache_stats"] = cache.stats()
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--pairs", type=int, default=1664)
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--threads", type=int, default=-1)
    p.add_argument("--wire", default="both",
                   choices=["f32", "compact", "both"],
                   help="H2D wire dtypes (data/pipeline.py compact_wire)"
                        "; 'both' prints one row per mode (A/B)")
    p.add_argument("--device_cache", type=int, default=0,
                   help="device-resident image-feature cache slots "
                        "(data/device_cache.py); only miss rows + "
                        "question tokens cross the wire. 0 = off")
    p.add_argument("--force_cpu", action="store_true")
    a = p.parse_args()

    if a.force_cpu:
        os.environ["EKAID_PLATFORM"] = "cpu"
        from ekaid_tpu.utils.platform import apply_platform_env
        apply_platform_env()
    elif not _relay_up():
        print(json.dumps({"error": "axon relay down"}))
        sys.exit(1)
    from ekaid_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    modes = ["f32", "compact"] if a.wire == "both" else [a.wire]
    for wire in modes:
        print(json.dumps(run_e2e(a.batch, a.pairs, a.images, a.threads,
                                 wire=wire,
                                 device_cache=a.device_cache)),
              flush=True)


if __name__ == "__main__":
    main()
