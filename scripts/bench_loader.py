"""Host data-loader throughput vs device consumption rates.

The chip consumes ~2.1k pairs/s training (batch 64) and 10-14k pairs/s
decoding (batch 64/128) — each pair reads TWO images' features from
cmb_bbox_di_feats.hdf5 (52×1024 f32 + two 100×100 adj = ~293 KB/image,
combine_dicts.py:162-216 layout). This measures whether the threaded
Loader (data/pipeline.py) can feed that from a real HDF5, CPU-only —
no relay needed.

Writes a synthetic flagship-schema HDF5 (default 512 images, the
reference's 100-row-chunk int64 layout) to /tmp, then times Loader
iteration at the flagship batch size.

History on this 1-CPU box: per-sample h5py reads 356 pairs/s (and 114
on the reference's chunked layout); batched fancy-index reads 3.5k;
raw-mmap + native GIL-free gather 5.4k single-threaded. --threads > 1
only helps on multi-core hosts (the native gather releases the GIL).

Run: python scripts/bench_loader.py [--pairs 2048] [--threads 1]
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

os.environ.setdefault("EKAID_PLATFORM", "cpu")


def ensure_fixture(path: str, images: int, cfg,
                   feat_dtype: str = "float32") -> None:
    """Write (or validate) a synthetic flagship-schema HDF5 in the
    reference's chunked-int64 layout (combine_dicts.py:168-183)."""
    import h5py
    d = cfg.data
    rng = np.random.default_rng(0)
    if os.path.exists(path):
        # a stale fixture must match this run exactly (rows, dtype,
        # geometry) or the A/B labels lie; a partial/corrupt file from
        # a killed run must not poison the path forever
        try:
            with h5py.File(path, "r") as h5:
                f = h5["image_features"]
                adj = h5["image_adj_matrix"]
                ok = (f.shape[0] >= images
                      and f.dtype == np.dtype(feat_dtype)
                      and f.shape[1:] == (d.num_nodes, d.feature_dim)
                      and adj.shape[1:] == (d.adj_pad, d.adj_pad))
        except Exception:
            ok = False
        if not ok:
            os.remove(path)
    if not os.path.exists(path):
        n = images
        ch = min(100, n)   # reference uses 100-row chunks
        with h5py.File(path, "w") as h5:
            h5.create_dataset("image_features",
                              chunks=(ch, d.num_nodes, d.feature_dim),
                              data=rng.standard_normal(
                                  (n, d.num_nodes, d.feature_dim)
                              ).astype(feat_dtype))
            h5.create_dataset("image_bb",
                              chunks=(ch, d.num_nodes, 4),
                              data=rng.uniform(
                0, 1024, (n, d.num_nodes, 4)).astype(np.float32))
            for k in ("image_adj_matrix", "semantic_adj_matrix"):
                h5.create_dataset(k, chunks=(ch, d.adj_pad, d.adj_pad),
                                  data=rng.integers(
                    0, 3, (n, d.adj_pad, d.adj_pad), dtype=np.int64))
        print(f"wrote {path} "
              f"({os.path.getsize(path) / 2**20:.0f} MB)", flush=True)


def fixture_dataset(cfg, h5_path: str, pairs: int, images: int,
                    vocab_size: int = 100):
    """DiffVQADataset over the fixture HDF5 with synthetic QA arrays."""
    from ekaid_tpu.data.pipeline import DiffVQADataset, H5FeatureStore
    rng = np.random.default_rng(0)
    t = cfg.speaker.seq_length
    arrays = {
        "questions": rng.integers(
            1, vocab_size, (pairs, cfg.question.max_len)).astype(np.int32),
        "answers": rng.integers(1, vocab_size, (pairs, t)).astype(np.int32),
        "pos": rng.integers(0, 16, (pairs, t)).astype(np.int32),
        "feature_idx": rng.integers(
            0, images, (pairs, 2)).astype(np.int64),
    }
    return DiffVQADataset(cfg, H5FeatureStore(h5_path), "train",
                          arrays=arrays)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--pairs", type=int, default=2048)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--h5", default="/tmp/bench_loader_feats.hdf5")
    p.add_argument("--feat_dtype", default="float32",
                   choices=["float32", "float16"],
                   help="fixture feature dtype (extract --store_dtype)")
    a = p.parse_args()

    from ekaid_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from ekaid_tpu.config import default_config
    from ekaid_tpu.data.pipeline import Loader

    cfg = default_config()
    d = cfg.data
    ensure_fixture(a.h5, a.images, cfg, a.feat_dtype)
    ds = fixture_dataset(cfg, a.h5, a.pairs, a.images)
    loader = Loader(ds, batch_size=a.batch, shuffle=True, seed=0,
                    num_threads=a.threads, prefetch=a.prefetch)

    # one epoch warm (page cache), one timed
    for _ in loader:
        pass
    t0 = time.perf_counter()
    seen = 0
    for batch in loader:
        seen += batch["d_feats"].shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "pairs_per_sec": round(seen / dt, 1),
        "pairs": seen, "batch": a.batch, "threads": a.threads,
        "feat_dtype": a.feat_dtype,
        "bytes_per_pair_mb": round(
            2 * (d.num_nodes * d.feature_dim
                 * (2 if a.feat_dtype == "float16" else 4)
                 + 2 * d.adj_pad * d.adj_pad * 4) / 2**20, 2),
        "note": ("train step consumes ~2.1k pairs/s; decode 10-14k — "
                 "loader must exceed those for the chip rates to hold "
                 "end-to-end"),
    }))


if __name__ == "__main__":
    main()
