"""Native C++ library vs. Python implementations."""

import numpy as np
import pytest

from ekaid_tpu.native import bindings as nat
from ekaid_tpu.extract.pipeline import match_disease_to_anatomy
from ekaid_tpu.ops.graph import spatial_adjacency


requires_native = pytest.mark.skipif(not nat.available(),
                                     reason="native lib not built")


def random_boxes(rng, n, size=1024):
    x1 = rng.uniform(0, size * 0.8, n)
    y1 = rng.uniform(0, size * 0.8, n)
    w = rng.uniform(5, size * 0.5, n)
    h = rng.uniform(5, size * 0.5, n)
    return np.stack([x1, y1, np.minimum(x1 + w, size),
                     np.minimum(y1 + h, size)], -1).astype(np.float32)


def test_native_builds():
    assert nat.ensure_built(), "C++ build failed"
    assert nat.available()


@requires_native
def test_native_adjacency_matches_python(rng):
    boxes = np.stack([random_boxes(rng, 52) for _ in range(4)])
    got = nat.spatial_adjacency_batch(boxes, pad=100)
    for b in range(4):
        want = spatial_adjacency(boxes[b], pad_to=100, xp=np)
        np.testing.assert_array_equal(got[b], want)


@requires_native
def test_native_match_matches_python(rng):
    for trial in range(5):
        ana = random_boxes(rng, 26)
        dis = random_boxes(rng, 26)
        valid = rng.random(26) > 0.2
        got = nat.match_disease(dis, valid, ana)
        feats = np.arange(26, dtype=np.float32)[:, None]
        _, cls = match_disease_to_anatomy(dis, feats, np.arange(26),
                                          valid, ana, 26)
        want = np.where(cls >= 26, -1, cls)
        np.testing.assert_array_equal(got, want), trial


@requires_native
def test_native_exact_match():
    seq = np.array([[1, 2, 3, 0, 9], [1, 2, 0, 0, 0],
                    [5, 5, 5, 5, 5]], np.int32)
    gt = np.array([[1, 2, 3, 0, 0], [1, 3, 0, 0, 0],
                   [5, 5, 5, 5, 5]], np.int32)
    got = nat.exact_match(seq, gt)
    # row0: matches through the terminating 0 (tail ignored)
    np.testing.assert_array_equal(got, [1, 0, 1])


@requires_native
def test_native_adjacency_faster_than_python(rng):
    import time
    boxes = np.stack([random_boxes(rng, 52) for _ in range(64)])
    t0 = time.perf_counter()
    nat.spatial_adjacency_batch(boxes, pad=100)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for b in boxes:
        spatial_adjacency(b, pad_to=100, xp=np)
    t_py = time.perf_counter() - t0
    print(f"native {t_native * 1e3:.2f} ms vs numpy {t_py * 1e3:.2f} ms")
    assert t_native < t_py


def test_native_caption_kernels_match_python(rng):
    """C++ lcs/bleu_counts/meteor_align vs the pure-Python paths
    (native/caption.cpp) — bit-equal on random answer-style corpora."""
    if not nat.available():
        pytest.skip("no C++ toolchain")
    import ekaid_tpu.metrics.caption as cap

    vocab = ["yes", "no", "lung", "effusion", "the", "left", "is",
             "worse", "nodule", "illness", "disease", "has", "changed"]

    def sent(n):
        return [vocab[i] for i in rng.integers(0, len(vocab), n)]

    gts = {str(k): [sent(rng.integers(1, 14)) for _ in
                    range(rng.integers(1, 3))] for k in range(30)}
    res = {str(k): sent(rng.integers(1, 14)) for k in range(30)}

    native_scores = {
        "bleu": cap.bleu(gts, res)[0],
        "rouge": cap.rouge_l(gts, res)[0],
        "meteor": cap.meteor15(gts, res)[0],
    }
    # force the pure-Python paths
    orig = cap._native
    cap._native = lambda: None
    try:
        python_scores = {
            "bleu": cap.bleu(gts, res)[0],
            "rouge": cap.rouge_l(gts, res)[0],
            "meteor": cap.meteor15(gts, res)[0],
        }
    finally:
        cap._native = orig
    np.testing.assert_allclose(native_scores["bleu"],
                               python_scores["bleu"], rtol=1e-12)
    assert native_scores["rouge"] == python_scores["rouge"]
    assert native_scores["meteor"] == python_scores["meteor"]
