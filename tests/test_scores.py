"""Knowledge-table and score-analysis tests."""

import json

import numpy as np

from ekaid_tpu.data import knowledge as K
from ekaid_tpu.train.score import (accuracy, metrics_by_question_type,
                                   per_abnormality, find_best_checkpoint)


def test_combined_class_indexing():
    assert len(K.ANATOMY_CLASSES) == 27        # 26 detector + stray edema
    assert len(K.DISEASE_CLASSES) == 22
    assert K.NUM_CLASSES == 49
    assert K.DISEASE_CLASSES[0] == "aortic enlargement"
    assert K.DISEASE_CLASSES[21] == "other lesion"


def test_semantic_tables_organ_edges():
    organ, co, is_dis = K.semantic_tables()
    # 'right lung' (0) and 'atelectasis' (27+1) are both Lung
    atel = len(K.ANATOMY_CLASSES) + K.DISEASE_CLASSES.index("atelectasis")
    assert organ[0] == organ[atel] == K.ORGAN_IDS["Lung"]
    assert not is_dis[0] and is_dis[atel]
    assert organ[K.NUM_CLASSES] == -1          # sentinel
    assert co.sum() == 0                       # no co-occurrence data


def test_cooccurrence_threshold():
    # diag-normalized: row i divided by adj[i,i]
    counting = np.array([[0.5, 0.2], [0.2, 0.4]])
    got = K.build_cooccurrence(counting_adj=counting, threshold=0.18)
    # row0: [1.0, 0.4] -> [2, 2]; row1: [0.5, 1.0] -> [2, 2]
    np.testing.assert_array_equal(got, [[2, 2], [2, 2]])
    got = K.build_cooccurrence(counting_adj=counting, threshold=0.45)
    np.testing.assert_array_equal(got, [[2, 0], [2, 2]])


def test_semantic_tables_with_cooccurrence():
    counting = np.eye(14) * 0.5 + 0.2
    organ, co, is_dis = K.semantic_tables(counting_adj=counting)
    atel = len(K.ANATOMY_CLASSES) + K.DISEASE_CLASSES.index("atelectasis")
    card = len(K.ANATOMY_CLASSES) + K.DISEASE_CLASSES.index("cardiomegaly")
    assert co[atel, card] == 2                 # 0.2/0.7 > 0.18
    # the stray anatomy 'edema' participates (combine_dicts.py:141-147)
    edema_ana = K.ANATOMY_CLASSES.index("edema")
    assert co[edema_ana, atel] == 2


def make_files(tmp_path):
    gt = {"annotations": [
        {"image_id": "0", "caption": "yes",
         "question": "is there edema?", "question_type": "presence"},
        {"image_id": "1", "caption": "no",
         "question": "any effusion?", "question_type": "presence"},
        {"image_id": "2", "caption": "left lung",
         "question": "where is it?", "question_type": "location"},
        {"image_id": "3", "caption": "everything",
         "question": "what has changed compared to last?",
         "question_type": "difference"},
        {"image_id": "4", "caption": "atelectasis, edema",
         "question": "what abnormalities are seen in this image?",
         "question_type": "abnormality"},
    ]}
    res = [{"image_id": "0", "caption": "yes"},
           {"image_id": "1", "caption": "yes"},
           {"image_id": "2", "caption": "left lung"},
           {"image_id": "3", "caption": "nothing"},
           {"image_id": "4", "caption": "atelectasis, effusion"}]
    gt_f = tmp_path / "gt.json"
    res_f = tmp_path / "res.json"
    gt_f.write_text(json.dumps(gt))
    res_f.write_text(json.dumps(res))
    return str(gt_f), str(res_f)


def test_accuracy_total_open_closed(tmp_path):
    gt_f, res_f = make_files(tmp_path)
    total, open_a, closed = accuracy(gt_f, res_f)
    # 'what has changed' row skipped -> 4 scored: correct 0,2,4(no: pred
    # differs) => yes/left lung correct, id1 wrong, id4 wrong
    assert abs(total - 3 / 4) < 1e-9 or abs(total - 2 / 4) < 1e-9
    # closed = ids 0,1 -> 1 of 2 correct
    assert abs(closed - 0.5) < 1e-9


def test_metrics_by_type(tmp_path):
    gt_f, res_f = make_files(tmp_path)
    scores = metrics_by_question_type(gt_f, res_f, "location")
    assert abs(scores["Bleu_1"] - 1.0) < 1e-6  # exact match subset


def test_per_abnormality(tmp_path):
    gt_f, res_f = make_files(tmp_path)
    out = per_abnormality(gt_f, res_f, ["atelectasis", "edema",
                                        "effusion"])
    assert out["atelectasis"] == 1.0
    assert out["edema"] == 0.0


def test_best_checkpoint_sweep(tmp_path):
    gt_f, res_f = make_files(tmp_path)
    good = json.load(open(res_f))
    bad = [{**r, "caption": "zzz"} for r in good]
    (tmp_path / "eval_results_100.json").write_text(json.dumps(bad))
    (tmp_path / "eval_results_200.json").write_text(json.dumps(good))
    step, best = find_best_checkpoint(str(tmp_path), gt_f)
    assert step == 200


def test_viz_panels_render(tmp_path):
    import numpy as np
    from ekaid_tpu.viz.draw import draw_attention, draw_detections, draw_pair
    img = np.random.default_rng(0).random((32, 32))
    boxes = np.array([[2, 2, 12, 12], [15, 5, 28, 20]], np.float32)
    for fn, args in [
        (draw_detections, (img, boxes)),
        (draw_attention, (img, boxes, [0.9, 0.1])),
    ]:
        p = tmp_path / f"{fn.__name__}.png"
        fn(*args, save=str(p))
        assert p.stat().st_size > 1000
    p = tmp_path / "pair.png"
    draw_pair(img, img, "q?", "a", "gt", att_bef=[0.5, 0.5],
              boxes_bef=boxes, save=str(p))
    assert p.stat().st_size > 1000


def test_viz_sheet_and_module_weight_panels(tmp_path):
    import numpy as np
    from ekaid_tpu.viz.draw import (draw_answer_distribution,
                                    draw_example_sheet,
                                    draw_module_weights)
    rng = np.random.default_rng(1)
    img = rng.random((32, 32))
    boxes = np.array([[2, 2, 12, 12]], np.float32)
    rows = [{"image_bef": img, "image_aft": img,
             "question": "what has changed?",
             "answer": "nothing has changed", "gt_answer": "nothing",
             "boxes_bef": boxes, "boxes_aft": boxes}
            for _ in range(2)]
    p = tmp_path / "sheet.png"
    draw_example_sheet(rows, save=str(p))
    assert p.stat().st_size > 1000

    w = rng.dirichlet([1, 1, 1], size=8)
    p = tmp_path / "mw.png"
    draw_module_weights(w, tokens=list("abcdefgh"), save=str(p))
    assert p.stat().st_size > 1000

    p = tmp_path / "dist.png"
    draw_answer_distribution({"yes": 20, "no": 8, "maybe": 1},
                             save=str(p))
    assert p.stat().st_size > 1000


def test_ask_question_synthetic(tmp_path):
    """draw_by_asking_question parity drive: free-form question over a
    synthetic trainer, multinomial answer histogram + greedy answer."""
    from ekaid_tpu.config import default_config
    from ekaid_tpu.train.train import build_synthetic_trainer
    from ekaid_tpu.viz.ask import ask_question

    cfg = default_config()
    cfg = cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=32, rnn_size=16, embed_input_dim=96, embed_dim=32,
            word_embed_size=8, seq_length=6),
        data=cfg.data.replace(num_nodes=6, feature_dim=24, adj_pad=10),
        question=cfg.question.replace(hidden_dim=32),
    )
    trainer = build_synthetic_trainer(cfg, str(tmp_path))
    res = ask_question(trainer, 0, "what has changed ?", n_samples=4,
                       seed=0)
    assert sum(res["counts"].values()) == 4
    assert isinstance(res["greedy"], str)
    assert isinstance(res["gt_answer"], str)
    # the module-weights panel data must actually flow out of decode
    # (was silently None: decode didn't return module_weights)
    mw = res["module_weights"]
    assert mw is not None and mw.shape[-1] == 3
    # rows for emitted tokens sum to 1; post-EOS rows are zeroed in
    # both the early-exit and scan decode paths
    sums = mw.sum(-1)
    assert np.all((np.abs(sums - 1.0) < 1e-3) | (np.abs(sums) < 1e-6))
    assert (np.abs(sums - 1.0) < 1e-3).any()


def test_find_examples_filters(tmp_path):
    import json

    from ekaid_tpu.viz.examples import find_examples

    gt = {"annotations": [
        {"id": "0", "image_id": "0", "caption": "nothing has changed",
         "question": "what has changed ?",
         "question_type": "difference"},
        {"id": "1", "image_id": "1", "caption": "yes",
         "question": "is there pneumonia ?",
         "question_type": "presence"},
        {"id": "2", "image_id": "2", "caption": "left lung",
         "question": "where is the effusion ?",
         "question_type": "location"},
    ], "images": [{"id": str(i)} for i in range(3)]}
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))

    rows = find_examples(str(p), question_type="presence")
    assert [r["id"] for r in rows] == ["1"]
    rows = find_examples(str(p), keyword="effusion")
    assert [r["id"] for r in rows] == ["2"]
    rows = find_examples(str(p), n=2)
    assert len(rows) == 2
