"""Batched CXR feature extraction (anatomy + disease) → combined graph file.

Replaces the reference's three host-loop stages, which are locked to
batch 1 by the forward-hook scheme (SURVEY.md §3.3):
  * anatomy extraction — ana_bbox_generator.py:557-621 (per-class top-1
    from the top-100 detections, zero-filled missing classes, spatial
    adjacency, HDF5 append);
  * disease extraction by location — bbox_generator_by_location.py:653-703
    (top-26 detections greedily re-anchored onto the anatomy boxes via
    `match_bbx`, :476-516);
  * graph combination — combine_dicts.py:252-287 (52-node features,
    semantic adjacency from the expert KGs, 100×100 spatial adjacency).

Here detection runs as one batched jitted program per detector
(FasterRCNN.extract / .__call__), host threads only do image IO and file
writes, and all three stages fuse into a single pass per image pair of
detectors. Output is the reference-compatible HDF5 layout
(image_features [N,52,1024], image_bb [N,52,4], image_adj_matrix
[N,100,100], semantic_adj_matrix [N,100,100], bbox_label [N,52]) so the
model-side loader (H5FeatureStore) reads either pipeline's artifact.

Conscious fix (documented): the reference records class 0 ('right lung')
for *missing* anatomy nodes (ana_bbox_generator.py:595 appends
torch.zeros(1)), giving phantom organ edges in the semantic KG; here
missing nodes carry the sentinel class and get no semantic edges.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ekaid_tpu.data import knowledge as K
from ekaid_tpu.ops.graph import spatial_adjacency


def iou_plus_one(a: np.ndarray, b: np.ndarray) -> float:
    """Reference IoU with +1 convention (bbox_generator_by_location.py's
    get_iou, same as ana_bbox_generator.py:213-240)."""
    ixmin = max(a[0], b[0])
    ixmax = min(a[2], b[2])
    iymin = max(a[1], b[1])
    iymax = min(a[3], b[3])
    iw = max(ixmax - ixmin + 1.0, 0.0)
    ih = max(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    uni = ((a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
           + (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0) - inter)
    return inter / uni if uni > 0 else 0.0


def iou_plus_one_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized iou_plus_one: a [N,4] × b [M,4] → [N,M] f64.
    Same formula (incl. the +1 convention and uni<=0 → 0), computed in
    float64 like the native C++ path and the reference's Python floats
    — for float32 inputs this can differ from the float32 scalar loop
    in the last f32 ulp (which could flip an exact near-tie in the
    greedy matcher; accepted, it matches the reference's precision)."""
    a = np.asarray(a, np.float64)[:, None, :]
    b = np.asarray(b, np.float64)[None, :, :]
    iw = np.maximum(np.minimum(a[..., 2], b[..., 2])
                    - np.maximum(a[..., 0], b[..., 0]) + 1.0, 0.0)
    ih = np.maximum(np.minimum(a[..., 3], b[..., 3])
                    - np.maximum(a[..., 1], b[..., 1]) + 1.0, 0.0)
    inter = iw * ih
    uni = ((a[..., 2] - a[..., 0] + 1.0) * (a[..., 3] - a[..., 1] + 1.0)
           + (b[..., 2] - b[..., 0] + 1.0)
           * (b[..., 3] - b[..., 1] + 1.0) - inter)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(uni > 0, inter / uni, 0.0)
    return out


def match_disease_to_anatomy(dis_boxes: np.ndarray, dis_feats: np.ndarray,
                             dis_classes: np.ndarray, dis_valid: np.ndarray,
                             ana_boxes: np.ndarray, num_classes: int
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy IoU re-anchoring (match_bbx parity,
    bbox_generator_by_location.py:476-516).

    Iterates disease detections in score order; each anatomy box j takes
    the highest-IoU disease seen so far, with the reference's exact
    stealing rule: a later disease may take j from its current holder
    only if the holder still holds >1 anatomy boxes. Output row j is
    anatomy box j carrying the feature/class of its assigned disease
    (zeros / sentinel `num_classes` when none).
    """
    n_ana = len(ana_boxes)
    best_iou = np.zeros(n_ana)
    holder = {}                      # ana j -> disease i
    holds: Dict[int, List[int]] = {}  # disease i -> [ana js]
    # one vectorized IoU matrix instead of 26x26 scalar-Python calls
    # (3.3 ms -> ~0.1 ms per image; the greedy loop is unchanged)
    iou_mat = iou_plus_one_matrix(dis_boxes, ana_boxes)
    for i in range(len(dis_boxes)):
        if not dis_valid[i]:
            continue
        for j in range(n_ana):
            iou = iou_mat[i, j]
            if iou > best_iou[j] and j not in holder:
                best_iou[j] = iou
                holder[j] = i
                holds.setdefault(i, []).append(j)
            elif iou > best_iou[j] and len(holds[holder[j]]) > 1:
                holds[holder[j]].remove(j)
                best_iou[j] = iou
                holder[j] = i
                holds.setdefault(i, []).append(j)
    feat_dim = dis_feats.shape[-1]
    out_feat = np.zeros((n_ana, feat_dim), np.float32)
    out_class = np.full(n_ana, num_classes, np.int64)
    for j, i in holder.items():
        out_feat[j] = dis_feats[i]
        out_class[j] = dis_classes[i]
    return out_feat, out_class


def combine_pair(ana: Dict[str, np.ndarray], dis: Dict[str, np.ndarray],
                 organ_table: np.ndarray, cooccur_table: np.ndarray,
                 is_disease: np.ndarray, adj_pad: int = 100
                 ) -> Dict[str, np.ndarray]:
    """Fuse one image's anatomy + disease extractions into the 52-node
    record (combine_dicts.py:265-280 semantics).

    ana: features [26,F], boxes [26,4], classes [26] (sentinel==26 when
         missing — see module docstring), found [26]
    dis: features [26,F], classes [26] re-anchored onto ana boxes
    """
    n_ana = ana["boxes"].shape[0]
    feats = np.concatenate([ana["features"], dis["features"]], 0)
    boxes = np.concatenate([ana["boxes"], ana["boxes"]], 0)

    # combined class ids: anatomy ids as-is (sentinel n_ana+... remapped),
    # disease ids offset by the anatomy-class count (cmb_pred_classes,
    # combine_dicts.py:98-105). Anatomy sentinel and disease sentinel both
    # map to the global sentinel.
    n_ana_classes = len(K.ANATOMY_CLASSES)
    ana_cls = np.where(ana["classes"] >= n_ana, K.NUM_CLASSES,
                       ana["classes"])
    dis_cls = np.where(dis["classes"] >= len(K.DISEASE_CLASSES),
                       K.NUM_CLASSES,
                       dis["classes"] + n_ana_classes)
    labels = np.concatenate([ana_cls, dis_cls], 0).astype(np.int64)

    n = boxes.shape[0]
    try:
        from ekaid_tpu.native import bindings as _nat
        if _nat.available():
            adj = _nat.spatial_adjacency_batch(
                boxes.astype(np.float32)[None], pad=adj_pad
            )[0].astype(np.int64)
        else:
            raise ImportError
    except ImportError:
        adj = np.zeros((adj_pad, adj_pad), np.int64)
        adj[:n, :n] = spatial_adjacency(boxes.astype(np.float32), xp=np)

    organs = organ_table[labels]
    disease = is_disease[labels]
    valid = organs >= 0
    same = organs[:, None] == organs[None, :]
    cross = disease[:, None] ^ disease[None, :]
    both = valid[:, None] & valid[None, :]
    sem = np.where(same & cross & both, 1, 0)
    co = cooccur_table[labels[:, None], labels[None, :]]
    sem = np.maximum(sem, np.where(both, co, 0)).astype(np.int64)
    sem_pad = np.zeros((adj_pad, adj_pad), np.int64)
    sem_pad[:n, :n] = sem

    return {"image_features": feats.astype(np.float32),
            "image_bb": boxes.astype(np.float32),
            "image_adj_matrix": adj,
            "semantic_adj_matrix": sem_pad,
            "bbox_label": labels}


class H5Writer:
    """Appending writer for the combined-graph HDF5 layout
    (combine_dicts.py save_h5, :162-216).

    feat_dtype='float16' (DOCUMENTED DEVIATION; reference stores f32)
    halves the dominant store/loader/H2D tensor. The model casts inputs
    to its compute dtype (bf16 on TPU) at entry anyway, so the f16
    round-trip loses less precision than that cast; the loader ships
    f16 rows to the device untouched."""

    def __init__(self, path: str, num_nodes: int, feat_dim: int,
                 adj_pad: int = 100, feat_dtype: str = "float32",
                 mode: str = "w", run_meta: Optional[Dict] = None):
        """mode='a' resumes an interrupted extraction: existing rows are
        kept (self.n continues from them) after a consistency repair —
        the 'committed_rows' attribute (written AFTER every dataset's
        data in append) is the commit point, so a crash torn anywhere
        inside an append — including inside the LAST dataset's write —
        truncates back to the previous commit. Geometry, dtype, or
        run_meta mismatches (shard spec, checkpoints, image dir) raise
        instead of silently mixing runs."""
        import h5py
        assert feat_dtype in ("float32", "float16")
        assert mode in ("w", "a")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        shapes = {
            "image_features": ((num_nodes, feat_dim), feat_dtype),
            "image_bb": ((num_nodes, 4), "float32"),
            "image_adj_matrix": ((adj_pad, adj_pad), "int64"),
            "semantic_adj_matrix": ((adj_pad, adj_pad), "int64"),
            "bbox_label": ((num_nodes,), "int64"),
        }
        if mode == "a" and os.path.exists(path):
            self._h5 = h5py.File(path, "r+")
            if run_meta:
                old = json.loads(self._h5.attrs.get("run_meta", "{}"))
                diff = {k: (old.get(k), v) for k, v in run_meta.items()
                        if old and old.get(k) != v}
                if diff:
                    raise ValueError(
                        f"resume run mismatch for {path}: "
                        + ", ".join(f"{k}: file={a!r} vs run={b!r}"
                                    for k, (a, b) in diff.items()))
            self.sets = {}
            for name, (shape, dtype) in shapes.items():
                if name not in self._h5:
                    raise ValueError(f"resume target {path} lacks "
                                     f"dataset {name!r}")
                ds = self._h5[name]
                if ds.shape[1:] != shape or ds.dtype != np.dtype(dtype):
                    raise ValueError(
                        f"resume geometry mismatch for {name!r}: file "
                        f"{ds.shape[1:]}/{ds.dtype} vs run "
                        f"{shape}/{dtype}")
                self.sets[name] = ds
            shortest = min(ds.shape[0] for ds in self.sets.values())
            self.n = min(shortest,
                         int(self._h5.attrs.get("committed_rows",
                                                shortest)))
            for ds in self.sets.values():    # repair a mid-append crash
                if ds.shape[0] != self.n:
                    ds.resize(self.n, axis=0)
            return
        self._h5 = h5py.File(path, "w")
        if run_meta:
            self._h5.attrs["run_meta"] = json.dumps(run_meta)
        self.n = 0

        def dset(name, shape, dtype):
            return self._h5.create_dataset(
                name, (0, *shape), maxshape=(None, *shape),
                chunks=(64, *shape), dtype=dtype)

        self.sets = {name: dset(name, shape, dtype)
                     for name, (shape, dtype) in shapes.items()}

    def append(self, records: Sequence[Dict[str, np.ndarray]]):
        m = len(records)
        for name, ds in self.sets.items():
            ds.resize(self.n + m, axis=0)
            ds[self.n:self.n + m] = np.stack([r[name] for r in records])
        self.n += m
        # commit point: rows count only once every dataset's data is in
        # place; bounds crash loss to one batch AND lets resume detect a
        # write torn inside the last dataset
        self._h5.attrs["committed_rows"] = self.n
        self._h5.flush()

    def truncate(self, n: int):
        """Drop rows past n (the static-shape tail batch zero-pads; the
        runner trims back to the real image count)."""
        if n < self.n:
            for ds in self.sets.values():
                ds.resize(n, axis=0)
            self.n = n
            self._h5.attrs["committed_rows"] = n
            self._h5.flush()

    # when set (extract/runner.py knows the real image count), close()
    # trims the zero-pad records the static-shape tail batch appended
    expected_rows: Optional[int] = None

    def close(self):
        if self.expected_rows is not None:
            self.truncate(self.expected_rows)
        self._h5.close()


class Extractor:
    """Runs both detectors over image batches and writes graph records.

    `ana_apply(images) -> extract dict` and `dis_apply(images) ->
    detections dict` are jitted callables built by
    ekaid_tpu.extract.runner; this class is pure host orchestration so it
    can be unit-tested without a trained detector.
    """

    def __init__(self, ana_apply, dis_apply, num_disease_classes: int,
                 counting_adj: Optional[np.ndarray] = None):
        self.ana_apply = ana_apply
        self.dis_apply = dis_apply
        self.num_disease_classes = num_disease_classes
        self.organ, self.cooccur, self.is_dis = K.semantic_tables(
            counting_adj=counting_adj)

    def dispatch(self, images: np.ndarray):
        """Enqueue both detector programs (JAX dispatch is async — this
        returns before the device finishes; `finish` fetches)."""
        return self.ana_apply(images), self.dis_apply(images)

    def finish(self, dispatched) -> List[Dict[str, np.ndarray]]:
        """Fetch a `dispatch` result and do the host-side per-image
        graph assembly (match + combine)."""
        ana_d, dis_d = dispatched
        ana = {k: np.asarray(v) for k, v in ana_d.items()}
        dis = {k: np.asarray(v) for k, v in dis_d.items()}
        out = []
        n = next(iter(ana.values())).shape[0]
        for b in range(n):
            ana_rec = {k: v[b] for k, v in ana.items()}
            # disease: top-26 detections re-anchored onto anatomy boxes
            # (bbox_generator_by_location.py:653-703)
            dis_feat, dis_cls = match_disease_to_anatomy(
                dis["boxes"][b], dis["features"][b], dis["classes"][b],
                dis["valid"][b], ana_rec["boxes"],
                self.num_disease_classes)
            dis_rec = {"features": dis_feat, "classes": dis_cls}
            out.append(combine_pair(ana_rec, dis_rec, self.organ,
                                    self.cooccur, self.is_dis))
        return out

    def process_batch(self, images: np.ndarray
                      ) -> List[Dict[str, np.ndarray]]:
        return self.finish(self.dispatch(images))

    def run(self, image_batches: Iterable[np.ndarray], writer: H5Writer,
            log_every: int = 50):
        """One-deep software pipeline: batch i+1's device programs are
        enqueued BEFORE batch i's results are fetched, so the host-side
        graph assembly + HDF5 write overlap device compute (and, on
        axon, the relay roundtrip). Results are identical to the serial
        loop — only the dispatch order changes."""
        import time
        state = {"n": 0, "i": -1, "warm_t": None, "warm_n": 0}
        t0 = time.time()

        def flush(dispatched, bsize):
            writer.append(self.finish(dispatched))
            state["n"] += bsize
            state["i"] += 1
            if state["i"] == 0:
                state["warm_t"] = time.time()  # first batch = compile
                state["warm_n"] = state["n"]
            if (state["i"] + 1) % log_every == 0:
                rate = state["n"] / (time.time() - t0)
                print(f"extracted {state['n']} images "
                      f"({rate:.2f} img/s)")

        pending = None                 # (dispatched, batch_size)
        for images in image_batches:
            nxt = (self.dispatch(images), images.shape[0])
            if pending is not None:
                flush(*pending)
            pending = nxt
        if pending is not None:
            flush(*pending)
        n_img, warm_imgs = state["n"], state["warm_n"]
        t_warm = state["warm_t"]
        writer.close()
        total = max(time.time() - t0, 1e-9)
        rate = n_img / total
        msg = f"done: {n_img} images at {rate:.2f} img/s"
        if t_warm is not None and n_img > warm_imgs:
            steady = (n_img - warm_imgs) / max(time.time() - t_warm, 1e-9)
            msg += f" (steady-state {steady:.2f} img/s)"
        print(msg)
        return n_img
