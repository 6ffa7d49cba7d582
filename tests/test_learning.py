"""Convergence proof: the training loop actually LEARNS.

The reference demonstrates learning by training on MIMIC-Diff-VQA
(train_mimic.py:187-383); no dataset exists in this environment, so the
strongest available training-correctness evidence is an overfit run: a
tiny fixed corpus (32 pairs, 8 distinct question→answer mappings) must
drive the teacher-forced loss to ~0 and the greedy decode must
reproduce every answer verbatim (Bleu_1 ≈ 1, closed-answer accuracy 1.0
via train/score.py::accuracy). A sign-flip in the loss mask, a
scrambled batch, or an LR-schedule bug all fail this test while passing
shape/finiteness checks.

Also asserts the best-checkpoint logic (Trainer.snapshot_and_eval)
selected the converged snapshot — the reference keeps the best-Bleu_1
model the same way (train_mimic.py:366-377).
"""

import json
import os

import numpy as np
import pytest

from ekaid_tpu.config import load_config
from ekaid_tpu.data.pipeline import DiffVQADataset, SyntheticFeatureStore
from ekaid_tpu.data.vocab import Vocabulary
from ekaid_tpu.train.train import Trainer

# 8 distinct (question, answer) mappings — 2 closed ("yes"/"no") + 6
# open multi-word answers. Each question is a distinct token pattern,
# so the mapping is learnable from the question stream alone (features
# are per-pair-fixed noise; the model may also key on them — either
# memorization path proves the optimization loop works).
CORPUS = [
    ("is there any change", "yes"),
    ("is the heart normal", "no"),
    ("what abnormality is seen", "pleural effusion in the left lobe"),
    ("what has improved", "the edema has resolved"),
    ("where is the opacity", "right lower lung zone"),
    ("what is the main finding", "enlarged cardiac silhouette"),
    ("what disease is present", "atelectasis near the diaphragm"),
    ("what level of difference", "significant change"),
]


def _build_vocab():
    streams = [q.split() for q, _ in CORPUS] + \
              [a.split() for _, a in CORPUS]
    return Vocabulary.build(streams)


def _build_dataset(cfg, vocab, n_pairs=32):
    t = cfg.speaker.seq_length
    qmax = cfg.question.max_len
    questions = np.zeros((n_pairs, qmax), np.int32)
    answers = np.zeros((n_pairs, t), np.int32)
    pos = np.zeros((n_pairs, t), np.int32)
    for i in range(n_pairs):
        q, a = CORPUS[i % len(CORPUS)]
        questions[i] = np.asarray(vocab.encode(q.split(), qmax), np.int32)
        ids = vocab.encode(a.split(), t - 1)
        answers[i, 0] = 1                       # <start>
        answers[i, 1:] = np.asarray(ids, np.int32)
        pos[i, :t] = (answers[i] > 0).astype(np.int32)  # dummy POS tags
    rng = np.random.default_rng(7)
    feature_idx = np.stack([rng.integers(0, 64, n_pairs),
                            rng.integers(0, 64, n_pairs)],
                           -1).astype(np.int64)
    arrays = {"questions": questions, "answers": answers, "pos": pos,
              "feature_idx": feature_idx}
    store = SyntheticFeatureStore(cfg, n_images=64)
    return DiffVQADataset(cfg, store, "train", arrays=arrays)


@pytest.mark.slow
def test_learnable_corpus_generalizes(tmp_path):
    """The learnable synthetic corpus (data/pipeline.py::
    learnable_dataset — answers are deterministic functions of the
    pair's hot-node features) must be LEARNED, not memorized: the eval
    split's QA pairs are disjoint from training, so Bleu_1/accuracy
    only climb if the model picked up the feature→answer rule. This is
    the CPU half of VERDICT r4 #7; the on-chip dress rehearsal runs the
    same corpus at flagship dims (train_mimic.py:280-383 loop)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "smoke.yaml"))
    cfg = cfg.replace(
        speaker=cfg.speaker.replace(drop_prob_lm=0.0),
        question=cfg.question.replace(dropout_att=0.0),
        train=cfg.train.replace(
            # recipe from the r5 probes: lr 3e-3 oscillates at smoke
            # dims and the att regularizer fights the hot-node
            # attention, so this is a pure-optimization setting (the
            # flagship on-chip rehearsal keeps shipped defaults)
            max_iter=2200, snapshot_interval=1100, log_interval=200,
            att_reg_weight=0.0,
            optim=cfg.train.optim.replace(lr=5e-4, step_size=10 ** 6)),
    )
    from ekaid_tpu.train.train import build_synthetic_trainer
    trainer = build_synthetic_trainer(cfg, str(tmp_path / "learn"),
                                      n_pairs=64, corpus="learnable")
    # 64*8=512 QA pairs -> train 410 / eval-test 52, disjoint
    assert not set(map(int, trainer.train_ds.split_idxs)) & \
        set(map(int, trainer.eval_ds.split_idxs))
    last = trainer.train(log_every=200)
    assert last["speaker_loss"] < 0.5, last
    scores, preds = trainer.evaluate()
    # generalization: unseen QA pairs answered by the learned rule
    # (probe reference: train-split Bleu_1 0.885 / acc 0.84 @ 2250)
    assert scores["Bleu_1"] >= 0.6, scores
    assert scores["acc_total"] >= 0.4, scores


@pytest.mark.slow
def test_overfit_tiny_corpus(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "smoke.yaml"))
    vocab = _build_vocab()
    cfg = cfg.replace(
        # dropout off: this is a pure-optimization check — drop_prob_lm
        # 0.5 floors the teacher-forced loss far above 0 even after the
        # greedy decode is verbatim-perfect
        speaker=cfg.speaker.replace(vocab_size=vocab.size,
                                    drop_prob_lm=0.0),
        question=cfg.question.replace(dropout_att=0.0),
        train=cfg.train.replace(
            max_iter=700, snapshot_interval=350, log_interval=100,
            optim=cfg.train.optim.replace(lr=2e-3, step_size=10 ** 6)),
    )

    train_ds = _build_dataset(cfg, vocab)
    eval_ds = _build_dataset(cfg, vocab)
    workdir = str(tmp_path / "overfit")
    trainer = Trainer(cfg, workdir, train_ds, eval_ds, vocab)
    last = trainer.train(log_every=100)

    # 1. teacher-forced loss converged to ~0
    assert last["speaker_loss"] < 0.05, \
        f"loss did not converge: {last}"

    # 2. greedy decode reproduces the memorized answers verbatim
    scores, predictions = trainer.evaluate()
    assert scores["Bleu_1"] >= 0.95, scores
    assert scores["acc_closed"] == 1.0, scores
    assert scores["acc_total"] >= 0.95, scores
    # spot-check raw strings — metric bugs must not mask decode bugs
    exact = sum(predictions[str(i)] == CORPUS[i % len(CORPUS)][1]
                for i in range(len(train_ds)))
    assert exact >= 0.9 * len(train_ds), predictions

    # 3. best-checkpoint logic kept the converged snapshot
    final_scores = trainer.snapshot_and_eval(int(trainer.state.step))
    assert trainer.best >= 0.95
    assert trainer.best >= final_scores["Bleu_1"] - 1e-9
    best_dir = os.path.join(workdir, "snapshots")
    metas = [f for f in os.listdir(best_dir) if "best" in f.lower()]
    assert metas, f"no best checkpoint written in {os.listdir(best_dir)}"

    # 4. the metric trajectory is recorded (loss curve for STATUS)
    log_path = os.path.join(workdir, "metrics.jsonl")
    if os.path.exists(log_path):
        rows = [json.loads(l) for l in open(log_path)]
        losses = [r["train/speaker_loss"] for r in rows
                  if "train/speaker_loss" in r]
        assert losses and losses[-1] < losses[0]
