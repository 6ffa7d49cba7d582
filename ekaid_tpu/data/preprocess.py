"""QA-text preprocessing: question CSV → packed arrays + vocab + splits.

Parity target: model/dataset_preparation.py —
  * transform_questions2dataset (:131-215): tokenize questions (≤20) and
    answers ('<start>' + ≤90 tokens), POS-tag answers, map study→dicom→
    feature row, build insertion-ordered vocab, write 80/10/10 splits.
  * save_coco_format (:89-130): per-split GT caption JSONs whose
    image_id is the question-row index.

Differences by design: output is a single compressed .npz (+ json
sidecars) instead of an incrementally resized HDF5 — the packed arrays
are small (~700K × 112 int32 ≈ 300 MB) and load zero-copy; the resumable
append bookkeeping (:27-88) disappears.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Optional

import numpy as np
import pandas as pd

from ekaid_tpu.data.vocab import Vocabulary, pos_tag, treebank_tokenize

Q_LEN = 20
A_LEN = 90


def transform_questions(question_csv: str, out_dir: str,
                        dicom2id_pkl: Optional[str] = None,
                        study2dicom_pkl: Optional[str] = None,
                        vocab_path: Optional[str] = None,
                        difference_only: bool = False) -> Dict[str, str]:
    """Build the packed QA dataset. Returns paths of artifacts written."""
    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_csv(question_csv)
    if difference_only:
        df = df[df["question_type"] == "difference"].reset_index(drop=True)

    dicom2id = study2dicom = None
    if dicom2id_pkl and study2dicom_pkl:
        with open(dicom2id_pkl, "rb") as f:
            dicom2id = pickle.load(f)
        with open(study2dicom_pkl, "rb") as f:
            study2dicom = pickle.load(f)

    q_tokens = [treebank_tokenize(q) for q in df["question"]]
    a_tokens = [["<start>"] + treebank_tokenize(a) for a in df["answer"]]

    if vocab_path and os.path.exists(vocab_path):
        vocab = Vocabulary.load(vocab_path)
        for toks in q_tokens + a_tokens:
            for t in toks:
                if t not in vocab.word_to_idx:
                    # parity with the unknown-word warning + append
                    # (dataset_preparation.py:176-178)
                    vocab.word_to_idx[t] = len(vocab.word_to_idx) + 1
        vocab = Vocabulary(vocab.word_to_idx)
    else:
        vocab = Vocabulary.build(q_tokens + a_tokens)

    n = len(df)
    questions = np.zeros((n, Q_LEN), np.int32)
    answers = np.zeros((n, A_LEN), np.int32)
    pos = np.zeros((n, A_LEN), np.int32)
    feature_idx = np.zeros((n, 2), np.int64)
    for i in range(n):
        questions[i] = vocab.encode(q_tokens[i], Q_LEN)
        answers[i] = vocab.encode(a_tokens[i], A_LEN)
        tags = pos_tag(a_tokens[i])[:A_LEN]
        pos[i, :len(tags)] = tags
        if dicom2id is not None:
            feature_idx[i, 0] = dicom2id[study2dicom[df.iloc[i]["study_id"]]]
            feature_idx[i, 1] = dicom2id[study2dicom[df.iloc[i]["ref_id"]]]
        else:
            feature_idx[i] = (2 * i, 2 * i + 1)   # synthetic/self-indexed

    npz_path = os.path.join(out_dir, "vqa_dataset.npz")
    np.savez_compressed(npz_path, questions=questions, answers=answers,
                        pos=pos, feature_idx=feature_idx)

    # 80/10/10 contiguous splits (dataset_preparation.py:204-208)
    idx = np.arange(n).tolist()
    splits = {
        "train": idx[:int(np.ceil(0.8 * n))],
        "val": idx[int(np.ceil(0.8 * n)):int(np.ceil(0.9 * n))],
        "test": idx[int(np.ceil(0.9 * n)):],
    }
    splits_path = os.path.join(out_dir, "splits_mimic_VQA.json")
    with open(splits_path, "w") as f:
        json.dump(splits, f)
    vocab_out = os.path.join(out_dir, "vocab_mimic_VQA.json")
    vocab.save(vocab_out)

    gt_paths = save_coco_format(df, splits, out_dir)
    return {"npz": npz_path, "splits": splits_path, "vocab": vocab_out,
            **gt_paths}


def save_coco_format(df: pd.DataFrame, splits: Dict, out_dir: str
                     ) -> Dict[str, str]:
    """Per-split COCO-style GT caption JSONs (dataset_preparation.py:89-130).
    image_id = the global question-row index, as the reference does."""
    out = {}
    for name, split in splits.items():
        annos, images = [], []
        for index in split:
            anno = {
                "id": str(index), "image_id": str(index), "category_id": 0,
                "caption": df["answer"][index],
                "question": df["question"][index],
            }
            # extension over the reference format: keep the type so score
            # analysis needs no side-channel CSV (evaluate_score.py:104)
            if "question_type" in df.columns:
                anno["question_type"] = df["question_type"][index]
            annos.append(anno)
            images.append({"id": str(index)})
        path = os.path.join(out_dir, f"mimic_gt_captions_{name}.json")
        with open(path, "w") as f:
            json.dump({"info": [], "licenses": [], "categories": [],
                       "images": images, "annotations": annos}, f)
        out[f"gt_{name}"] = path
    return out


def main():
    import argparse
    p = argparse.ArgumentParser(
        description="MIMIC-Diff-VQA text preprocessing "
                    "(dataset_preparation.py parity)")
    p.add_argument("-q", "--question_csv", required=True)
    p.add_argument("-o", "--out_dir", default="data")
    p.add_argument("--dicom2id")
    p.add_argument("--study2dicom")
    p.add_argument("--vocab")
    p.add_argument("--difference_only", action="store_true")
    a = p.parse_args()
    paths = transform_questions(a.question_csv, a.out_dir, a.dicom2id,
                                a.study2dicom, a.vocab, a.difference_only)
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
