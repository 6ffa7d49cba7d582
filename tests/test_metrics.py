"""Caption-metric tests: identity anchors + hand-computed values."""

import math


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
