"""Synthetic MIMIC-Diff-VQA-shaped batches for tests and benchmarks.

Shapes mirror the real pipeline (BASELINE.md workload table): 52 nodes ×
1024-d features, 100×100 stored adjacency labels, 20-token questions,
91-token answer rows (<start> + 90), 147+1 vocab.
"""

from __future__ import annotations

import numpy as np

from ekaid_tpu.ops.graph import spatial_adjacency


def synthetic_batch(cfg, batch_size: int, seed: int = 0,
                    with_labels: bool = True) -> dict:
    rng = np.random.default_rng(seed)
    n = cfg.data.num_nodes
    feat = cfg.data.feature_dim
    pad = cfg.data.adj_pad
    tq = cfg.question.max_len
    t = cfg.speaker.seq_length
    vocab = cfg.speaker.vocab_size

    def boxes(b):
        x1 = rng.uniform(0, 800, (b, n))
        y1 = rng.uniform(0, 800, (b, n))
        w = rng.uniform(10, 500, (b, n))
        h = rng.uniform(10, 500, (b, n))
        return np.stack([x1, y1, np.minimum(x1 + w, 1024.0),
                         np.minimum(y1 + h, 1024.0)], -1).astype(np.float32)

    d_bb = boxes(batch_size)
    q_bb = boxes(batch_size)
    d_adj = np.zeros((batch_size, pad, pad), np.int64)
    q_adj = np.zeros((batch_size, pad, pad), np.int64)
    d_adj[:, :n, :n] = spatial_adjacency(d_bb, xp=np)
    q_adj[:, :n, :n] = spatial_adjacency(q_bb, xp=np)
    d_sem = np.zeros((batch_size, pad, pad), np.int64)
    q_sem = np.zeros((batch_size, pad, pad), np.int64)
    d_sem[:, :n, :n] = rng.integers(0, 3, (batch_size, n, n))
    q_sem[:, :n, :n] = rng.integers(0, 3, (batch_size, n, n))

    batch = {
        "d_feats": rng.standard_normal(
            (batch_size, n, feat), dtype=np.float32),
        "q_feats": rng.standard_normal(
            (batch_size, n, feat), dtype=np.float32),
        "d_adj": d_adj, "q_adj": q_adj,
        "d_sem_adj": d_sem, "q_sem_adj": q_sem,
        "d_bb": d_bb, "q_bb": q_bb,
        "question": np.concatenate([
            rng.integers(1, vocab - 1, (batch_size, tq // 2)),
            np.zeros((batch_size, tq - tq // 2), np.int64)],
            axis=1).astype(np.int64),
    }
    if with_labels:
        lengths = rng.integers(1, max(2, t // 2), batch_size)
        labels = np.zeros((batch_size, t + 1), np.int64)
        masks = np.zeros((batch_size, t + 1), np.float32)
        labels[:, 0] = 1                      # <start>
        for i, L in enumerate(lengths):
            labels[i, 1:1 + L] = rng.integers(1, vocab - 1, L)
            masks[i, :L + 2] = 1.0            # tokens + EOS slot
        batch["labels"] = labels
        batch["masks"] = masks
    return batch
