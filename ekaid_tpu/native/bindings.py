"""ctypes bindings for the native graph library, with numpy fallbacks.

The C++ implementations in graph.cpp mirror ekaid_tpu/ops/graph.py
(spatial adjacency) and ekaid_tpu/extract/pipeline.py (greedy disease
re-anchoring); unit tests assert cross-implementation equality. The
library is built on demand (`ensure_built()` shells out to make once)
and everything degrades to the Python path when a compiler is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libekaid_graph.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def ensure_built(force: bool = False) -> bool:
    global _TRIED
    if os.path.exists(_SO) and not force:
        return True
    if _TRIED and not force:
        return os.path.exists(_SO)
    _TRIED = True
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.spatial_adjacency_batch.argtypes = [
        f32p, i64, i64, i64, ctypes.c_float, ctypes.c_float, i32p]
    lib.match_disease.argtypes = [f32p, u8p, i64, f32p, i64, i32p]
    lib.exact_match.argtypes = [i32p, i32p, i64, i64, u8p]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def spatial_adjacency_batch(boxes: np.ndarray, pad: int = 100,
                            img_w: float = 1024.0, img_h: float = 1024.0
                            ) -> np.ndarray:
    """boxes [N, R, 4] float32 -> [N, pad, pad] int32 adjacency labels."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    if boxes.ndim == 2:
        boxes = boxes[None]
    n, r = boxes.shape[0], boxes.shape[1]
    lib = _lib()
    if lib is None:
        from ekaid_tpu.ops.graph import spatial_adjacency
        return np.stack([spatial_adjacency(b, pad_to=pad, img_w=img_w,
                                           img_h=img_h, xp=np)
                         for b in boxes]).astype(np.int32)
    out = np.zeros((n, pad, pad), np.int32)
    lib.spatial_adjacency_batch(boxes, n, r, pad, img_w, img_h, out)
    return out


def match_disease(dis_boxes: np.ndarray, dis_valid: np.ndarray,
                  ana_boxes: np.ndarray) -> np.ndarray:
    """-> assignment [n_ana] int32: disease index per anatomy box, -1
    when unassigned."""
    lib = _lib()
    dis_boxes = np.ascontiguousarray(dis_boxes, np.float32)
    ana_boxes = np.ascontiguousarray(ana_boxes, np.float32)
    dv = np.ascontiguousarray(dis_valid, np.uint8)
    if lib is None:
        from ekaid_tpu.extract.pipeline import match_disease_to_anatomy
        feats = np.arange(len(dis_boxes), dtype=np.float32)[:, None]
        _, cls = match_disease_to_anatomy(
            dis_boxes, feats, np.arange(len(dis_boxes)), dis_valid.astype(
                bool), ana_boxes, len(dis_boxes))
        return np.where(cls >= len(dis_boxes), -1, cls).astype(np.int32)
    out = np.zeros(len(ana_boxes), np.int32)
    lib.match_disease(dis_boxes, dv, len(dis_boxes), ana_boxes,
                      len(ana_boxes), out)
    return out


def exact_match(seq: np.ndarray, gt: np.ndarray) -> np.ndarray:
    seq = np.ascontiguousarray(seq, np.int32)
    gt = np.ascontiguousarray(gt, np.int32)
    lib = _lib()
    if lib is None:
        out = np.zeros(len(seq), np.uint8)
        for i in range(len(seq)):
            s, g = seq[i], gt[i]
            ok = True
            for a, b in zip(s, g):
                if a != b:
                    ok = False
                    break
                if a == 0:
                    break
            out[i] = ok
        return out
    out = np.zeros(len(seq), np.uint8)
    lib.exact_match(seq, gt, seq.shape[0], seq.shape[1], out)
    return out
