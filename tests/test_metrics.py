"""Caption-metric tests: identity anchors + hand-computed values."""

import math

import numpy as np

from ekaid_tpu.metrics.caption import (bleu, cider, meteor_lite,
                                       ptb_tokenize, rouge_l, _lcs_len)
from ekaid_tpu.metrics.coco import (CaptionEvaluator, CocoCaptions,
                                    evaluate_files)


def toks(*sents):
    return [s.split() for s in sents]


def test_ptb_tokenize():
    assert ptb_tokenize("Hello , world !") == ["hello", "world"]
    assert ptb_tokenize("no change .") == ["no", "change"]
    assert ptb_tokenize("what ?") == ["what"]
    assert ptb_tokenize("pleural effusion") == ["pleural", "effusion"]


def test_bleu_perfect_match():
    gts = {"0": toks("the cat sat on the mat")}
    res = {"0": "the cat sat on the mat".split()}
    scores, _ = bleu(gts, res)
    for s in scores:
        assert abs(s - 1.0) < 1e-9


def test_bleu_hand_computed_unigram():
    # cand: "the cat" vs ref "the cat sat": p1 = 2/2, p2 = 1/1,
    # BP = exp(1 - 3/2)
    gts = {"0": toks("the cat sat")}
    res = {"0": "the cat".split()}
    scores, _ = bleu(gts, res, max_n=2)
    bp = math.exp(1 - 3 / 2)
    assert abs(scores[0] - bp) < 1e-6
    assert abs(scores[1] - bp) < 1e-6


def test_bleu_clipping():
    # "the the the" vs ref "the cat": clipped p1 = 1/3
    gts = {"0": toks("the cat")}
    res = {"0": "the the the".split()}
    scores, _ = bleu(gts, res, max_n=1)
    assert abs(scores[0] - 1 / 3) < 1e-6    # BP=1 (cand 3 > ref 2)


def test_bleu_closest_ref_length():
    # two refs len 2 and 10; cand len 3 -> closest is 2 -> BP = 1
    gts = {"0": toks("a b", "a b c d e f g h i j")}
    res = {"0": "a b x".split()}
    scores, _ = bleu(gts, res, max_n=1)
    assert abs(scores[0] - 2 / 3) < 1e-6


def test_lcs():
    assert _lcs_len("a b c d".split(), "a x c d".split()) == 3
    assert _lcs_len([], ["a"]) == 0


def test_rouge_identity_and_hand():
    gts = {"0": toks("the cat sat")}
    res = {"0": "the cat sat".split()}
    mean, _ = rouge_l(gts, res)
    assert abs(mean - 1.0) < 1e-9
    # cand "the cat", ref "the cat sat": P=1, R=2/3, beta=1.2
    res = {"0": "the cat".split()}
    mean, _ = rouge_l(gts, res)
    b2 = 1.2 ** 2
    want = (1 + b2) * 1.0 * (2 / 3) / ((2 / 3) + b2 * 1.0)
    assert abs(mean - want) < 1e-9


def test_cider_identity_is_ten():
    # identical candidate/ref; >1 image so idf isn't degenerate
    gts = {"0": toks("a cat sits outside"),
           "1": toks("a dog runs inside")}
    res = {"0": "a cat sits outside".split(),
           "1": "a dog runs inside".split()}
    mean, per = cider(gts, res)
    assert abs(per["0"] - 10.0) < 1e-6
    assert abs(mean - 10.0) < 1e-6


def test_cider_disjoint_is_zero():
    gts = {"0": toks("a b c d"), "1": toks("e f g h")}
    res = {"0": "x y z w".split(), "1": "q r s t".split()}
    mean, _ = cider(gts, res)
    assert mean == 0.0


def test_meteor_identity():
    gts = {"0": toks("there is no change")}
    res = {"0": "there is no change".split()}
    mean, _ = meteor_lite(gts, res)
    # perfect match: P=R=1, fmean=1, 1 chunk/4 matches
    want = 1.0 * (1 - 0.5 * (1 / 4) ** 3)
    assert abs(mean - want) < 1e-9


def test_meteor_stem_stage():
    gts = {"0": toks("running fast")}
    res = {"0": "runs fast".split()}
    mean, _ = meteor_lite(gts, res)
    assert mean > 0.4          # 'runs'→'run'≈'running'→'run' stem match


def test_evaluator_end_to_end(tmp_path):
    anns = {"annotations": [
        {"id": "0", "image_id": "0", "caption": "no change .",
         "question": "what has changed ?"},
        {"id": "1", "image_id": "1", "caption": "pleural effusion .",
         "question": "what abnormalities are seen ?"},
    ], "images": [{"id": "0"}, {"id": "1"}]}
    results = [{"image_id": "0", "caption": "no change ."},
               {"image_id": "1", "caption": "pleural effusion is seen ."}]
    import json
    ann_f = tmp_path / "gt.json"
    res_f = tmp_path / "res.json"
    ann_f.write_text(json.dumps(anns))
    res_f.write_text(json.dumps(results))
    scores = evaluate_files(str(ann_f), str(res_f), verbose=False)
    assert set(scores) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                           "METEOR", "ROUGE_L", "CIDEr"}
    assert 0.5 < scores["Bleu_1"] <= 1.0
    assert scores["CIDEr"] > 0


def test_evaluator_subset_param():
    gts = CocoCaptions(annotations={"annotations": [
        {"id": "0", "image_id": "0", "caption": "a b"},
        {"id": "1", "image_id": "1", "caption": "c d"}]})
    res = gts.load_res([{"image_id": "0", "caption": "a b"}])
    ev = CaptionEvaluator(gts, res)
    scores = ev.evaluate()
    assert abs(scores["Bleu_1"] - 1.0) < 1e-6


def test_meteor15_hand_computed():
    """METEOR-1.5 fixtures computed by hand from the published formula
    (alpha .85, beta .2, gamma .6, delta .75, weights 1/.6/.8)."""
    from ekaid_tpu.metrics.caption import meteor15

    # identical 1 content word: P=R=1, Fmean=1, ch/m=1 -> pen=0.6
    mean, _ = meteor15({"a": [["pneumonia"]]}, {"a": ["pneumonia"]})
    np.testing.assert_allclose(mean, 0.4, atol=1e-9)

    # identical 4 content words, one chunk: pen = .6*(1/4)^.2
    toks = ["pleural", "effusion", "has", "worsened"]
    # 'has' is a function word -> enters with weight (1-delta)
    mean, _ = meteor15({"a": [toks]}, {"a": toks})
    pen = 0.6 * (1 / 4) ** 0.2
    np.testing.assert_allclose(mean, 1 - pen, atol=1e-9)

    # synonym stage: 'illness' ~ 'disease' (weight .8)
    mean, _ = meteor15({"a": [["disease"]]}, {"a": ["illness"]})
    # P = .8*delta/delta = .8 = R; Fmean = .8; pen = .6
    np.testing.assert_allclose(mean, 0.8 * 0.4, atol=1e-9)

    # no match -> 0
    mean, _ = meteor15({"a": [["normal"]]}, {"a": ["collapsed"]})
    assert mean == 0.0


def test_meteor15_vs_lite_delta_pinned():
    """Quantifies the lite-vs-1.5 deviation on a fixed answer-style
    corpus (the number documented in docs/PARITY.md)."""
    from ekaid_tpu.metrics.caption import meteor15

    gts = {
        "1": [["yes"]],
        "2": [["no"]],
        "3": [["the", "pleural", "effusion", "has", "worsened"]],
        "4": [["there", "is", "a", "new", "nodule", "in", "the",
               "left", "lung"]],
        "5": [["nothing", "has", "changed"]],
        "6": [["pneumonia"]],
    }
    res = {
        "1": ["yes"],
        "2": ["yes"],
        "3": ["the", "effusion", "is", "worse"],
        "4": ["a", "nodule", "appears", "in", "the", "left", "lung"],
        "5": ["nothing", "changed"],
        "6": ["pneumonic", "infection"],
    }
    lite, _ = meteor_lite(gts, res)
    full, _ = meteor15(gts, res)
    assert 0 < full < 1 and 0 < lite < 1
    # pinned measured values (regression anchors; see docs/PARITY.md)
    np.testing.assert_allclose(lite, 0.2864, atol=2e-3)
    np.testing.assert_allclose(full, 0.2539, atol=2e-3)


def test_meteor_chunks_require_adjacency_in_both_strings():
    """METEOR chunk definition: matched pairs are one chunk only when
    contiguous in BOTH hypothesis and reference. 'the cat X sat' vs
    'the cat sat' matches (0,0),(1,1),(3,2): consecutive ref indices
    but a hyp gap -> 2 chunks, penalizing the interleaved mismatch."""
    from ekaid_tpu.metrics.caption import _meteor15_align
    pairs, chunks = _meteor15_align(
        ["the", "cat", "x", "sat"], ["the", "cat", "sat"], {})
    assert [(i, j) for i, j, _ in pairs] == [(0, 0), (1, 1), (3, 2)]
    assert chunks == 2


def test_proposal_recall():
    """Proposal-mode AR (evaluator.py:462 parity): hand-computable
    fixture — 2 GT, one proposal hits IoU 1.0, one hits ~0.6."""
    from ekaid_tpu.metrics.detection import proposal_recall

    gt = np.asarray([[[0, 0, 10, 10], [20, 20, 30, 30]]], np.float32)
    gt_valid = np.asarray([[True, True]])
    props = np.asarray([[[0, 0, 10, 10],          # exact hit
                         [20, 20, 30, 26.67],     # IoU ~ 0.667
                         [50, 50, 60, 60]]], np.float32)
    scores = np.asarray([[0.9, 0.8, 0.7]])
    valid = np.ones((1, 3), bool)
    out = proposal_recall(props, scores, valid, gt, gt_valid,
                          limits=(100,))
    # overlaps = [1.0, 0.667]; thresholds 0.5..0.95 (10 values):
    # gt1 counted at all 10, gt2 at 0.5..0.65 (4) -> AR = (10+4)/20
    np.testing.assert_allclose(out["AR@100"], 14 / 20, atol=1e-6)

    # limit=1 keeps only the top-scoring proposal -> gt2 never matched
    out = proposal_recall(props, scores, valid, gt, gt_valid,
                          limits=(1,))
    np.testing.assert_allclose(out["AR@1"], 10 / 20, atol=1e-6)


def test_meteor15_alignment_is_chunk_minimizing():
    """The jar's Aligner criteria (maximize matches, then minimize
    chunks): a staged-greedy left-to-right aligner picks ref[0] for
    'cat' here (2 chunks); the beam search must find the contiguous
    alignment (1 chunk)."""
    from ekaid_tpu.metrics.caption import _meteor15_align

    pairs, chunks = _meteor15_align(["the", "cat"],
                                    ["cat", "the", "cat"], {})
    assert len(pairs) == 2
    assert chunks == 1
    assert [(i, j) for i, j, s in pairs] == [(0, 1), (1, 2)]


def test_meteor15_alignment_distance_tiebreak():
    """Equal matches and chunks -> minimize summed |i - j| (criterion 4):
    'a' at hyp[0] must take ref[0], not ref[2]."""
    from ekaid_tpu.metrics.caption import _meteor15_align

    pairs, chunks = _meteor15_align(["a"], ["a", "b", "a"], {})
    assert pairs == [(0, 0, 0)]


def test_meteor15_alignment_matches_bruteforce():
    """On small inputs (where beam 40 is effectively exhaustive) the
    aligner must achieve the true optimum of the jar's resolution
    criteria (max matches, then min chunks, then min summed distance) —
    verified against full enumeration of one-to-one matchings."""
    import random
    from ekaid_tpu.metrics.caption import (_meteor15_align,
                                           _meteor_candidates)

    def brute(hyp, ref):
        cands = _meteor_candidates(hyp, ref, {})
        best = [(0, 0, 0)]

        def rec(i, used, pairs):
            if i == len(hyp):
                ch = dist = 0
                pi = pj = -2
                for (a, b, _s) in pairs:
                    ch += 0 if (a == pi + 1 and b == pj + 1) else 1
                    dist += abs(a - b)
                    pi, pj = a, b
                key = (len(pairs), ch, dist)
                bm, bch, bd = best[0]
                if (-key[0], key[1], key[2]) < (-bm, bch, bd):
                    best[0] = key
                return
            rec(i + 1, used, pairs)
            for j, stage in cands[i]:
                if not used >> j & 1:
                    rec(i + 1, used | (1 << j), pairs + [(i, j, stage)])

        rec(0, 0, [])
        return best[0]

    rng = random.Random(0)
    words = ["a", "b", "c"]
    for _ in range(150):
        hyp = [rng.choice(words) for _ in range(rng.randint(1, 5))]
        ref = [rng.choice(words) for _ in range(rng.randint(1, 5))]
        pairs, chunks = _meteor15_align(hyp, ref, {})
        got = (len(pairs), chunks,
               sum(abs(i - j) for i, j, _s in pairs))
        assert got == brute(hyp, ref), (hyp, ref, got)


def test_meteor15_native_matches_python_beam():
    """C++ beam search (native/caption.cpp) must agree with the Python
    search on randomized corpora, including repeated words where greedy
    and search diverge."""
    import random

    from ekaid_tpu.metrics import caption as cap
    from ekaid_tpu.native import bindings

    if bindings._lib() is None:
        pytest.skip("native lib unavailable")

    rng = random.Random(7)
    words = ["a", "b", "c", "d", "cats", "cat", "dog", "the"]
    for _ in range(200):
        hyp = [rng.choice(words) for _ in range(rng.randint(1, 9))]
        ref = [rng.choice(words) for _ in range(rng.randint(1, 9))]
        # call once through the normal path (native) and once with the
        # native lib masked (python)
        n_pairs, n_chunks = cap._meteor15_align(hyp, ref, {})
        old = cap._native
        cap._native = lambda: None
        try:
            p_pairs, p_chunks = cap._meteor15_align(hyp, ref, {})
        finally:
            cap._native = old
        assert n_chunks == p_chunks, (hyp, ref)
        assert len(n_pairs) == len(p_pairs), (hyp, ref)


def test_derive_vocab_synonyms_reference_vocab():
    """Auto-derived synonym table for the reference's shipped 147-word
    answer vocab: exactly the in-vocabulary WordNet-3.0 synset
    {area, region} (region.n.03) — the only base synset with two
    members inside the vocab. Plural pairs (lung/lungs, base/bases) are
    NOT synsets; the stem module matches them at higher weight, exactly
    as the jar would."""
    import json
    import os

    from ekaid_tpu.metrics.meteor_resources import derive_vocab_synonyms

    path = "/root/reference/model/data/vocab_mimic_VQA.json"
    if not os.path.exists(path):
        pytest.skip("reference vocab not present")
    vocab = json.load(open(path))
    derived = derive_vocab_synonyms(vocab)
    assert sorted(tuple(sorted(s)) for s in derived) == [
        ("area", "region")]


def test_meteor15_paraphrase_stage():
    """Paraphrase module (jar's 4th matcher, weight .6): a 1<->2-word
    table pair must align as one span match. Hand-computed from the 1.5
    formula: wp=.6*.75, wr=.6*1.5, p=r=.6, Fmean=.6, m=(1+2)/2,
    pen=.6*(1/1.5)^.2."""
    from ekaid_tpu.metrics.caption import meteor15

    mean, _ = meteor15({"a": [["collapsed", "lung"]]},
                       {"a": ["atelectasis"]})
    pen = 0.6 * (1 / 1.5) ** 0.2
    np.testing.assert_allclose(mean, 0.6 * (1 - pen), atol=1e-9)

    # stage disabled via paraphrases=() -> no match at all here
    mean, _ = meteor15({"a": [["collapsed", "lung"]]},
                       {"a": ["atelectasis"]}, paraphrases=())
    assert mean == 0.0


def test_meteor15_paraphrase_span_alignment():
    """Span matches interact with word matches and chunk adjacency:
    'left side' <-> 'left' (table pair) then adjacent 'improved' must
    form ONE chunk and beat the 2-chunk word-only alignment on covered
    words (5 > 4)."""
    from ekaid_tpu.metrics.caption import _meteor15_align_spans
    from ekaid_tpu.metrics.meteor_resources import paraphrase_index

    para_idx, mp = paraphrase_index()
    spans, chunks, mh, mr = _meteor15_align_spans(
        ["left", "side", "improved"], ["left", "improved"], {},
        para_idx, mp)
    assert (0, 2, 0, 1, 3) in spans and (2, 1, 1, 1, 0) in spans
    assert chunks == 1 and mh == 3 and mr == 2


def test_meteor15_identical_phrases_use_exact_stage():
    """A table phrase appearing verbatim on BOTH sides must not be
    demoted to a paraphrase match — exact word matches score higher and
    the jar's table pairs two DIFFERENT strings."""
    from ekaid_tpu.metrics.caption import meteor15

    toks = ["pleural", "effusion", "worsened"]
    mean, _ = meteor15({"a": [toks]}, {"a": toks})
    pen = 0.6 * (1 / 3) ** 0.2
    np.testing.assert_allclose(mean, 1 - pen, atol=1e-9)


def test_load_paraphrase_table(tmp_path):
    """Loader handles the jar table formats: '|||'-delimited with
    probability fields, and plain tab-delimited."""
    from ekaid_tpu.metrics.caption import meteor15
    from ekaid_tpu.metrics.meteor_resources import load_paraphrase_table

    p = tmp_path / "para.txt"
    p.write_text("0.3 ||| heart size ||| cardiac silhouette\n"
                 "x ray\tradiograph\n"
                 "malformed-line\n")
    pairs = load_paraphrase_table(p)
    assert ("heart size", "cardiac silhouette") in pairs
    assert ("x ray", "radiograph") in pairs and len(pairs) == 2

    mean, _ = meteor15({"a": [["x", "ray"]]}, {"a": ["radiograph"]},
                       paraphrases=pairs)
    assert mean > 0.0
