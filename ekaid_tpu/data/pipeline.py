"""Host data pipeline: feature stores + QA dataset + prefetching loader.

Replaces the reference's RCCDataset_mimic/RCCDataLoader
(model/datasets/rcc_dataset_pos_mimic.py) with a threaded, prefetching
batch assembler:

  * the reference loads the QA h5 fully into RAM (:78-95) and lazily
    reads the feature HDF5 per sample (:97-110) on a single thread
    (num_workers: 0, configs/dynamic/dynamic_change_pos_mimic.yaml:34) —
    here feature reads run in a worker pool ahead of the device;
  * the reference reseeds random to 1111 in every __getitem__ (:172),
    freezing caption subsampling — here seq_per_img == 1 (the shipped
    setting) reads the single caption directly and epoch shuffling uses
    an explicit per-epoch seed;
  * feature_mode slicing both/single_ana/single_loc parity (:177-207),
    including the move_adj 3to1 block swap for single_loc (:132-140);
  * batches are plain dicts of numpy arrays matching EkaidModel's schema.
"""

from __future__ import annotations

import json
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from ekaid_tpu.data.vocab import Vocabulary


class FeatureStore:
    """index -> dict(feats [N,F], bb [N,4], adj [P,P], sem_adj [P,P])."""

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError


class H5FeatureStore(FeatureStore):
    """Reads the reference's cmb_bbox_di_feats.hdf5 layout
    (combine_dicts.py:162-216: image_features [M,52,1024], image_bb
    [M,52,4], image_adj_matrix [M,100,100], semantic_adj_matrix
    [M,100,100])."""

    def __init__(self, path: str):
        import h5py
        self.path = path
        self._h5 = h5py.File(path, "r")
        self.features = self._h5["image_features"]
        self.bb = self._h5["image_bb"]
        self.adj = self._h5["image_adj_matrix"]
        self.sem_adj = self._h5["semantic_adj_matrix"]
        node_one = self.features.shape[1] // 2
        assert node_one * 2 == self.features.shape[1]

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        return {
            "feats": np.asarray(self.features[idx], np.float32),
            "bb": np.asarray(self.bb[idx], np.float32),
            "adj": np.asarray(self.adj[idx], np.int32),
            "sem_adj": np.asarray(self.sem_adj[idx], np.int32),
        }

    def __len__(self):
        return self.features.shape[0]

    def clone(self) -> "H5FeatureStore":
        """Fresh file handle for a worker thread (h5py handles are not
        safe for concurrent reads)."""
        return H5FeatureStore(self.path)


class SyntheticFeatureStore(FeatureStore):
    """Deterministic per-index synthetic features (tests/benchmarks)."""

    def __init__(self, cfg, n_images: int = 1024):
        self.cfg = cfg
        self.n = n_images

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        # xp=np: this runs inside prefetch worker threads, which must not
        # touch JAX (device work belongs to the main thread)
        from ekaid_tpu.ops.graph import spatial_adjacency
        d = self.cfg.data
        rng = np.random.default_rng(idx)
        x1 = rng.uniform(0, 800, d.num_nodes)
        y1 = rng.uniform(0, 800, d.num_nodes)
        w = rng.uniform(10, 500, d.num_nodes)
        h = rng.uniform(10, 500, d.num_nodes)
        bb = np.stack([x1, y1, np.minimum(x1 + w, 1024.0),
                       np.minimum(y1 + h, 1024.0)], -1).astype(np.float32)
        adj = np.zeros((d.adj_pad, d.adj_pad), np.int32)
        adj[:d.num_nodes, :d.num_nodes] = spatial_adjacency(bb, xp=np)
        sem = np.zeros((d.adj_pad, d.adj_pad), np.int32)
        sem[:d.num_nodes, :d.num_nodes] = rng.integers(
            0, 3, (d.num_nodes, d.num_nodes))
        return {
            "feats": rng.standard_normal(
                (d.num_nodes, d.feature_dim)).astype(np.float32),
            "bb": bb, "adj": adj, "sem_adj": sem,
        }

    def __len__(self):
        return self.n


class DiffVQADataset:
    """QA rows + paired feature lookups (RCCDataset_mimic parity)."""

    def __init__(self, cfg, store: FeatureStore, split: str,
                 npz_path: Optional[str] = None,
                 splits_path: Optional[str] = None,
                 vocab: Optional[Vocabulary] = None,
                 arrays: Optional[Dict[str, np.ndarray]] = None,
                 image_loader=None):
        #: mode0 (pixels-in) image source: callable idx -> [H, W] float
        #: (rcc_dataset_pos_mimic.py:142-149,209-219 reads 128² PNGs)
        self.image_loader = image_loader
        self.cfg = cfg
        self.store = store
        self.split = split
        self.vocab = vocab
        if arrays is None:
            data = np.load(npz_path)
            arrays = {k: data[k] for k in data.files}
        self.questions = arrays["questions"]
        self.answers = arrays["answers"]
        self.pos = arrays["pos"]
        self.feature_idx = arrays["feature_idx"]
        if splits_path is not None:
            with open(splits_path) as f:
                self.split_idxs = np.asarray(json.load(f)[split], np.int64)
        else:
            n = len(self.questions)
            bounds = {"train": (0, int(np.ceil(0.8 * n))),
                      "val": (int(np.ceil(0.8 * n)), int(np.ceil(0.9 * n))),
                      "test": (int(np.ceil(0.9 * n)), n),
                      "all": (0, n)}[split]
            self.split_idxs = np.arange(*bounds, dtype=np.int64)
        split_cfg = getattr(cfg.data, split if split != "all" else "test")
        max_samples = split_cfg.max_samples
        if max_samples is not None:
            self.split_idxs = self.split_idxs[:max_samples]
        self.batch_size = split_cfg.batch_size
        self.seq_length = self.answers.shape[1]

    def __len__(self):
        return len(self.split_idxs)

    def sample(self, img_idx: int) -> Dict[str, np.ndarray]:
        mode = self.cfg.data.feature_mode
        node_one = self.cfg.data.node_one_num
        fi = self.feature_idx[img_idx]
        del mode, node_one
        if self.cfg.data.feature_mode == "mode0":
            return self._sample_mode0(img_idx, fi)
        return self._features_for(img_idx, fi)

    def _sample_mode0(self, img_idx: int, fi) -> Dict[str, np.ndarray]:
        """Pixels-in sample (feature_mode mode0,
        rcc_dataset_pos_mimic.py:209-219): raw image pair, no graph."""
        assert self.image_loader is not None, (
            "feature_mode=mode0 needs an image_loader (idx -> [H, W])")
        d_img = np.asarray(self.image_loader(int(fi[0])), np.float32)
        q_img = np.asarray(self.image_loader(int(fi[1])), np.float32)
        out = self._labels_for(img_idx)
        out.update({"d_feats": d_img, "q_feats": q_img,
                    "pair_index": np.int64(img_idx),
                    "question": self.questions[img_idx].astype(np.int32)})
        return out

    def _labels_for(self, img_idx: int) -> Dict[str, np.ndarray]:
        T = self.seq_length
        labels = np.zeros(T + 1, np.int32)
        labels[:T] = self.answers[img_idx]
        mask = np.zeros(T + 1, np.float32)
        # tokens + one EOS slot (rcc_dataset_pos_mimic.py:260-263)
        mask[:int((labels != 0).sum()) + 1] = 1.0
        pos = np.zeros(T + 1, np.int32)
        pos[:T] = self.pos[img_idx]
        return {"labels": labels, "pos": pos, "masks": mask}

    def _features_for(self, img_idx: int, fi):
        mode = self.cfg.data.feature_mode
        node_one = self.cfg.data.node_one_num
        d = self.store.get(int(fi[0]))
        q = self.store.get(int(fi[1]))

        def slice_mode(rec):
            feats, bb = rec["feats"], rec["bb"]
            adj, sem = rec["adj"], rec["sem_adj"]
            if mode in ("both", "location"):
                return feats, bb, adj, sem
            if mode == "single_ana":
                return feats[:node_one], bb[:node_one], adj, sem
            if mode == "single_loc":
                adj = adj.copy()
                sem = sem.copy()
                # move_adj 3to1 (rcc_dataset_pos_mimic.py:132-140)
                for m in (adj, sem):
                    m[:node_one] = m[2 * node_one:3 * node_one]
                    m[:, :node_one] = m[:, 2 * node_one:3 * node_one]
                return (feats[-node_one:], bb[:node_one], adj, sem)
            raise ValueError(f"unknown feature_mode {mode!r}")

        d_feats, d_bb, d_adj, d_sem = slice_mode(d)
        q_feats, q_bb, q_adj, q_sem = slice_mode(q)

        out = self._labels_for(img_idx)
        out.update({
            "d_feats": d_feats, "q_feats": q_feats,
            "pair_index": np.int64(img_idx),
            "d_adj": d_adj, "q_adj": q_adj,
            "d_sem_adj": d_sem, "q_sem_adj": q_sem,
            "d_bb": d_bb, "q_bb": q_bb,
            "question": self.questions[img_idx].astype(np.int32),
        })
        return out


def _collate(samples) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Threaded prefetching batch iterator."""

    def __init__(self, dataset: DiffVQADataset, batch_size: Optional[int]
                 = None, shuffle: bool = False, seed: int = 0,
                 drop_remainder: bool = True, pad_final: bool = False,
                 num_threads: int = 4, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1):
        """pad_final=True keeps the remainder batch, padded to batch_size
        by repeating its last row — batch shape stays jit-stable and
        duplicate pair_index rows collapse in the predictions dict.

        shard_index/num_shards: multi-host data sharding — each host
        iterates a disjoint 1-in-num_shards slice of every epoch's
        (identically shuffled) order, so a jax.distributed pod feeds its
        per-host batch without coordination. Defaults are single-host.
        """
        self.ds = dataset
        self.batch_size = batch_size or dataset.batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder and not pad_final
        self.pad_final = pad_final
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.epoch = 0
        assert 0 <= shard_index < num_shards
        self.shard_index = shard_index
        self.num_shards = num_shards

    def _shard_len(self):
        # every host gets exactly n // k items: unequal shard sizes
        # would desynchronize the lockstep jitted train step across
        # processes (one host takes an extra global-mesh step and the
        # pod hangs); the <k leftover examples are dropped each epoch
        return len(self.ds) // self.num_shards

    def __len__(self):
        n = self._shard_len() // self.batch_size
        if not self.drop_remainder and self._shard_len() % self.batch_size:
            n += 1
        return n

    def _epoch_order(self):
        order = np.asarray(self.ds.split_idxs)
        if self.shuffle:
            # same seed on every host -> identical permutation, disjoint
            # strided slices
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(order)
        if self.num_shards > 1:
            order = order[self.shard_index::self.num_shards]
            order = order[:len(self.ds) // self.num_shards]  # lockstep
        return order

    def _batch_indices(self):
        order = self._epoch_order()
        self.epoch += 1
        nb = len(order) // self.batch_size
        rem = len(order) % self.batch_size
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if rem and not self.drop_remainder:
            tail = order[nb * self.batch_size:]
            if self.pad_final:
                pad = np.full(self.batch_size - rem, tail[-1],
                              dtype=tail.dtype)
                tail = np.concatenate([tail, pad])
            batches.append(tail)
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Multi-worker assembly with deterministic order: worker w
        builds batches w, w+N, w+2N, … into its own bounded queue (each
        worker holds a private feature-store handle — h5py handles are
        not safe for concurrent reads); the consumer round-robins the
        queues, so batch order matches the single-threaded loader
        exactly and lookahead is bounded by prefetch per worker."""
        import copy

        batches = self._batch_indices()
        n_workers = max(1, min(self.num_threads, len(batches) or 1))
        qs = [queue.Queue(maxsize=max(1, self.prefetch))
              for _ in range(n_workers)]
        stop = threading.Event()

        def worker(wid: int):
            ds = self.ds
            if n_workers > 1 and hasattr(ds.store, "clone"):
                ds = copy.copy(self.ds)
                ds.store = self.ds.store.clone()
            for bi in range(wid, len(batches), n_workers):
                if stop.is_set():
                    return
                try:
                    item = ("ok", _collate([ds.sample(int(i))
                                            for i in batches[bi]]))
                except Exception as e:          # surface in the consumer
                    item = ("error", e)
                while not stop.is_set():
                    try:
                        qs[wid].put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if item[0] == "error":
                    return

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(len(batches)):
                kind, payload = qs[bi % n_workers].get()
                if kind == "error":
                    raise payload
                yield payload
        finally:
            stop.set()


def synthetic_dataset(cfg, split: str = "train", n_pairs: int = 512,
                      vocab_size: Optional[int] = None) -> DiffVQADataset:
    """A fully synthetic DiffVQADataset (no files on disk)."""
    rng = np.random.default_rng(42)
    v = vocab_size or cfg.speaker.vocab_size
    t = cfg.speaker.seq_length
    n = n_pairs
    questions = np.zeros((n, cfg.question.max_len), np.int32)
    answers = np.zeros((n, t), np.int32)
    pos = np.zeros((n, t), np.int32)
    for i in range(n):
        ql = rng.integers(3, cfg.question.max_len)
        questions[i, :ql] = rng.integers(1, v - 1, ql)
        al = rng.integers(2, max(3, t // 3))
        answers[i, 0] = 1
        answers[i, 1:al] = rng.integers(1, v - 1, al - 1)
        pos[i, :al] = rng.integers(1, 16, al)
    feature_idx = np.stack([rng.integers(0, 256, n),
                            rng.integers(0, 256, n)], -1).astype(np.int64)
    arrays = {"questions": questions, "answers": answers, "pos": pos,
              "feature_idx": feature_idx}
    store = SyntheticFeatureStore(cfg, n_images=256)
    return DiffVQADataset(cfg, store, split, arrays=arrays)
