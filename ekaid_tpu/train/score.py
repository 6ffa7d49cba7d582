"""Post-hoc score analysis (evaluate_score.py parity).

  * acc — exact-string answer accuracy: total / open / closed, skipping
    'what has changed' questions; closed = yes/no answers
    (evaluate_score.py:216-251).
  * per-question-type caption metrics — filter results by question_type
    then re-run the caption evaluator (evaluate_score.py:296-336). Type
    comes from the GT annotations (preprocessing stores question_type)
    or a question CSV.
  * per-abnormality accuracy + ROC-AUC over "what abnormalities are seen
    in this image?" answers (evaluate_score.py:145-210).
  * best-checkpoint sweep over eval_results_*.json by accuracy
    (evaluate_score.py:259-271).
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ekaid_tpu.metrics.coco import CaptionEvaluator, CocoCaptions


def _load(path_or_obj):
    if isinstance(path_or_obj, str):
        with open(path_or_obj) as f:
            return json.load(f)
    return path_or_obj


def accuracy(gt_file, results_file, verbose: bool = True
             ) -> Tuple[float, float, float]:
    """total/open/closed exact-match accuracy (evaluate_score.py:216-251).
    Matches results to GT by image_id."""
    gt = _load(gt_file)["annotations"]
    pr = _load(results_file)
    pr_by_id = {str(r["image_id"]): r["caption"] for r in pr}

    totals = np.zeros(3)      # total, open, closed counts
    correct = np.zeros(3)
    for ann in gt:
        img = str(ann["image_id"])
        if img not in pr_by_id:
            continue
        if "what has changed" in ann.get("question", ""):
            continue
        gt_ans = ann["caption"]
        pr_ans = pr_by_id[img]
        closed = gt_ans in ("yes", "no")
        totals[0] += 1
        totals[2 if closed else 1] += 1
        if gt_ans == pr_ans:
            correct[0] += 1
            correct[2 if closed else 1] += 1
    with np.errstate(invalid="ignore"):
        out = np.where(totals > 0, correct / np.maximum(totals, 1), 0.0)
    if verbose:
        print("total", out[0])
        print("open", out[1])
        print("closed", out[2])
    return float(out[0]), float(out[1]), float(out[2])


def _question_types(gt_annotations, question_csv: Optional[str] = None
                    ) -> Dict[str, str]:
    """image_id -> question_type, from GT annotations or the CSV."""
    if question_csv:
        import pandas as pd
        df = pd.read_csv(question_csv)
        return {str(i): df.iloc[i]["question_type"]
                for i in range(len(df))}
    types = {}
    for a in gt_annotations["annotations"]:
        if "question_type" in a:
            types[str(a["image_id"])] = a["question_type"]
    return types


def metrics_by_question_type(gt_file, results_file, target_type: str,
                             question_csv: Optional[str] = None
                             ) -> Dict[str, float]:
    """Caption metrics over one question type (evaluate_score.py:296-336)."""
    gt = _load(gt_file)
    results = _load(results_file)
    types = _question_types(gt, question_csv)
    subset = [r for r in results
              if types.get(str(r["image_id"])) == target_type]
    if not subset:
        print(f"no results of type {target_type!r}")
        return {}
    coco = CocoCaptions(annotations=gt)
    res = coco.load_res(subset)
    ev = CaptionEvaluator(coco, res)
    scores = ev.evaluate()
    for k, v in scores.items():
        print(f"{k}: {v:.3f}")
    return scores


ABNORMALITY_QUESTION = "what abnormalities are seen in this image?"


def per_abnormality(gt_file, results_file, disease_names: List[str]
                    ) -> Dict[str, float]:
    """Per-disease accuracy + macro ROC-AUC over abnormality questions
    (evaluate_score.py:145-210). Answers are comma-separated finding
    lists; a finding counts when it exactly matches a disease name."""
    gt = _load(gt_file)["annotations"]
    pr_by_id = {str(r["image_id"]): r["caption"]
                for r in _load(results_file)}
    d2i = {d: i for i, d in enumerate(disease_names)}
    preds, gts = [], []
    for ann in gt:
        img = str(ann["image_id"])
        if ann.get("question") != ABNORMALITY_QUESTION or \
                img not in pr_by_id:
            continue
        g = np.zeros(len(disease_names))
        p = np.zeros(len(disease_names))
        for dis in str(ann["caption"]).split(","):
            if dis.strip() in d2i:
                g[d2i[dis.strip()]] = 1
        for dis in pr_by_id[img].split(","):
            if dis.strip() in d2i:
                p[d2i[dis.strip()]] = 1
        gts.append(g)
        preds.append(p)
    if not gts:
        print("no abnormality questions found")
        return {}
    gts_a = np.asarray(gts)
    preds_a = np.asarray(preds)
    out = {}
    for i, name in enumerate(disease_names):
        n = gts_a[:, i].sum()
        if n > 0:
            acc = float(((gts_a[:, i] == 1)
                         & (preds_a[:, i] == 1)).sum() / n)
            out[name] = acc
            print(name, acc)
    keep = gts_a.sum(0) > 0
    try:
        from sklearn.metrics import roc_auc_score
        auc = roc_auc_score(gts_a[:, keep], preds_a[:, keep],
                            average=None)
        out["auc_mean"] = float(np.mean(auc))
        print("auc", auc)
    except Exception as e:
        print("auc unavailable:", e)
    return out


def find_best_checkpoint(eval_dir: str, gt_file: str,
                         by: str = "accuracy") -> Tuple[int, float]:
    """Sweep eval_results_*.json for the best checkpoint — by total
    accuracy (find_the_best, evaluate_score.py:259-271) or by Bleu_1
    (finding_best_timing, evaluate_score.py:16-41)."""
    best, best_step = 0.0, -1
    for fname in sorted(os.listdir(eval_dir)):
        m = re.match(r"eval_results_(\d+)\.json$", fname)
        if not m:
            continue
        path = os.path.join(eval_dir, fname)
        if by == "accuracy":
            score, _, _ = accuracy(gt_file, path)
        else:
            coco = CocoCaptions(gt_file)
            ev = CaptionEvaluator(coco, coco.load_res(path))
            score = ev.evaluate()["Bleu_1"]
        if score > best:
            best, best_step = score, int(m.group(1))
    print("final", best_step, best)
    return best_step, best


def main(argv=None):
    p = argparse.ArgumentParser(description="EKAID-TPU score analysis")
    p.add_argument("-d", "--eval_dir", required=True,
                   help="results json OR directory of eval_results_*.json")
    p.add_argument("-g", "--gt", required=True, help="GT captions json")
    p.add_argument("-a", "--acc", action="store_true")
    p.add_argument("-t", "--target_type", default="",
                   help="question type filter for caption metrics")
    p.add_argument("--question_csv", default=None)
    p.add_argument("--sweep", action="store_true",
                   help="best-checkpoint sweep over a directory")
    p.add_argument("--sweep_by", default="accuracy",
                   choices=["accuracy", "bleu"])
    a = p.parse_args(argv)
    if a.sweep:
        find_best_checkpoint(a.eval_dir, a.gt, by=a.sweep_by)
    elif a.acc:
        accuracy(a.gt, a.eval_dir)
    elif a.target_type:
        metrics_by_question_type(a.gt, a.eval_dir, a.target_type,
                                 a.question_csv)
    else:
        from ekaid_tpu.metrics.coco import evaluate_files
        evaluate_files(a.gt, a.eval_dir)


if __name__ == "__main__":
    main()
