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
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libekaid_graph.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOCK = threading.Lock()   # first call can come from N loader threads


def ensure_built(force: bool = False) -> bool:
    """Run make (incremental: also rebuilds a stale .so when a source
    file is newer, e.g. after a repo update adds a new kernel)."""
    global _TRIED
    if _TRIED and not force:
        return os.path.exists(_SO)
    _TRIED = True
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return True
    except Exception:
        return os.path.exists(_SO)


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _LIB
    if not ensure_built():
        return None
    try:
        lib = _bind(ctypes.CDLL(_SO))
    except (OSError, AttributeError):
        # stale .so missing a newer symbol (make couldn't rebuild it,
        # e.g. no compiler): force one rebuild, else Python fallbacks
        if not ensure_built(force=True):
            return None
        try:
            lib = _bind(ctypes.CDLL(_SO))
        except (OSError, AttributeError):
            return None
    _LIB = lib
    return lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.spatial_adjacency_batch.argtypes = [
        f32p, i64, i64, i64, ctypes.c_float, ctypes.c_float, i32p]
    lib.match_disease.argtypes = [f32p, u8p, i64, f32p, i64, i32p]
    lib.exact_match.argtypes = [i32p, i32p, i64, i64, u8p]
    lib.lcs_len.argtypes = [i32p, i64, i32p, i64]
    lib.lcs_len.restype = i64
    lib.bleu_counts.argtypes = [i32p, i64, i32p, i64p, i64, i64, i64p,
                                i64p]
    lib.meteor_align.argtypes = [i32p, i32p, i32p, i64,
                                 i32p, i32p, i32p, i64, i32p, i32p]
    lib.meteor_align.restype = i64
    lib.gather_rows.argtypes = [ctypes.c_void_p, i64p, i64, i64,
                                ctypes.c_void_p, i64]
    lib.gather_rows_i64_i32.argtypes = [ctypes.c_void_p, i64p, i64, i64,
                                        i32p, i64]
    return lib


_GATHER_THREADS = max(1, min(8, os.cpu_count() or 1))


def gather_rows(base_addr: int, starts: np.ndarray, rowbytes: int,
                out: np.ndarray) -> bool:
    """Parallel GIL-free memcpy: out[i] = mem[starts[i]:+rowbytes].
    base_addr is the mmap base address; the CALLER must keep the mapping
    alive across the call. Returns False when the library is missing
    (caller falls back to numpy slicing)."""
    lib = _lib()
    if lib is None:
        return False
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    lib.gather_rows(base_addr, np.ascontiguousarray(starts, np.int64),
                    len(starts), rowbytes, out.ctypes.data, _GATHER_THREADS)
    return True


def gather_rows_i64_i32(base_addr: int, starts: np.ndarray, rowelems: int,
                        out: np.ndarray) -> bool:
    """gather_rows fused with int64 -> int32 narrowing (the reference
    adjacency dtype, combine_dicts.py:176-183)."""
    lib = _lib()
    if lib is None:
        return False
    assert out.dtype == np.int32 and out.flags.c_contiguous
    lib.gather_rows_i64_i32(base_addr,
                            np.ascontiguousarray(starts, np.int64),
                            len(starts), rowelems, out, _GATHER_THREADS)
    return True


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


# ----------------------------------------------------- caption metrics ---

def lcs_len(a: np.ndarray, b: np.ndarray) -> int:
    """LCS length over int32 token-id sequences (ROUGE-L inner DP)."""
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    lib = _lib()
    if lib is None:
        # O(na*nb) numpy-free fallback, identical semantics
        na, nb = len(a), len(b)
        if na == 0 or nb == 0:
            return 0
        prev = [0] * (nb + 1)
        for i in range(1, na + 1):
            cur = [0] * (nb + 1)
            ai = a[i - 1]
            for j in range(1, nb + 1):
                cur[j] = (prev[j - 1] + 1 if ai == b[j - 1]
                          else max(prev[j], cur[j - 1]))
            prev = cur
        return prev[nb]
    return int(lib.lcs_len(a, len(a), b, len(b)))


def bleu_counts(cand: np.ndarray, refs, max_n: int = 4):
    """Clipped n-gram (matches, totals) per order for one segment.
    cand int32 ids; refs = list of int32 id arrays. Requires the
    native lib (callers fall back to the pure-Python bleu)."""
    lib = _lib()
    if lib is None:
        return None
    cand = np.ascontiguousarray(cand, np.int32)
    refs = [np.ascontiguousarray(r, np.int32) for r in refs]
    flat = (np.concatenate(refs) if refs
            else np.zeros(0, np.int32))
    lens = np.asarray([len(r) for r in refs], np.int64)
    matches = np.zeros(max_n, np.int64)
    totals = np.zeros(max_n, np.int64)
    lib.bleu_counts(cand, len(cand), flat, lens, len(refs), max_n,
                    matches, totals)
    return matches, totals


def meteor_align(hyp_ids, hyp_stem, hyp_syn, ref_ids, ref_stem,
                 ref_syn):
    """METEOR-1.5 Aligner beam search (native/caption.cpp). syn ids:
    -1 = no synset; valid only when each word belongs to at most one
    synset (the bundled/vocab-derived tables — callers must fall back
    to Python otherwise). Returns (align [nh] int32 ref-index-or--1,
    stage [nh] int32 0/1/2-or--1, chunks int) or None when the native
    lib is unavailable or the reference exceeds the 64-word bitmask."""
    lib = _lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(hyp_ids, np.int32)
    hs = np.ascontiguousarray(hyp_stem, np.int32)
    hy = np.ascontiguousarray(hyp_syn, np.int32)
    r = np.ascontiguousarray(ref_ids, np.int32)
    rs = np.ascontiguousarray(ref_stem, np.int32)
    ry = np.ascontiguousarray(ref_syn, np.int32)
    align = np.zeros(len(h), np.int32)
    stage = np.zeros(len(h), np.int32)
    chunks = lib.meteor_align(h, hs, hy, len(h), r, rs, ry, len(r),
                              align, stage)
    if chunks < 0:            # nr > 64: kernel declined, use Python
        return None
    return align, stage, int(chunks)
