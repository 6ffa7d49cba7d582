"""Ask a free-form question about one study pair and sample answers.

Parity surface: model/visualizations/draw_by_asking_question.py — pick a
test-set sample, tokenize an arbitrary question (question_process,
:45-51), run multinomial sampling and report the answer histogram
(ans_count, :153-160), then plot. The reference replicates ONE sample
into a full dataloader batch and loops; here the n samples are one
jitted batch-n multinomial decode.
"""

from __future__ import annotations

import argparse
from collections import Counter
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def ask_question(trainer, index: int, question_text: str,
                 n_samples: int = 32, seed: int = 0,
                 temperature: Optional[float] = None):
    """Sample `n_samples` answers for (sample `index`, free-form
    question). Returns dict with answers, counts, module_weights of the
    greedy decode, and the gt answer."""
    from ekaid_tpu.data.vocab import treebank_tokenize

    ds, vocab, model = trainer.eval_ds, trainer.vocab, trainer.model
    s = dict(ds.sample(int(index)))
    tokens = treebank_tokenize(question_text)
    ids = [vocab.word_to_idx[t] for t in tokens
           if t in vocab.word_to_idx]
    q = np.zeros_like(s["question"])
    q[:len(ids)] = ids[:len(q)]
    s["question"] = q

    batch = {k: jnp.asarray(np.broadcast_to(
        np.asarray(v)[None], (n_samples,) + np.asarray(v).shape))
        for k, v in s.items() if k != "pair_index"}

    @jax.jit
    def sample_n(params, batch, rng):
        return model.apply(params, batch, method="decode",
                           sample_max=False, temperature=temperature,
                           rng=rng)["seq"]

    seqs = np.asarray(sample_n(trainer.state.params, batch,
                               jax.random.PRNGKey(seed)))
    answers = [vocab.decode(row) for row in seqs]
    counts = Counter(answers)

    # greedy decode once for the definitive answer + module weights
    one = {k: v[:1] for k, v in batch.items()}
    out = model.apply(trainer.state.params, one, method="decode",
                      sample_max=True)
    greedy = vocab.decode(np.asarray(out["seq"])[0])
    mw = out.get("module_weights")
    return {"answers": answers, "counts": dict(counts),
            "greedy": greedy,
            "module_weights": (np.asarray(mw)[0]
                               if mw is not None else None),
            "gt_answer": vocab.decode(s["labels"][1:]),
            "question_ids": ids}


def main(argv=None):
    from ekaid_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(
        description="Ask a question about a test study pair "
                    "(draw_by_asking_question.py parity)")
    p.add_argument("--cfg", default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--question", required=True)
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--out", default=None,
                   help="save the answer-distribution figure here")
    a = p.parse_args(argv)

    from ekaid_tpu.config import default_config, load_config
    from ekaid_tpu.train.train import (build_synthetic_trainer,
                                       build_trainer)
    cfg = load_config(a.cfg) if a.cfg else default_config()
    if a.synthetic:
        trainer = build_synthetic_trainer(cfg, "/tmp/ekaid_ask")
    else:
        trainer = build_trainer(cfg, "/tmp/ekaid_ask", "test")
    if a.checkpoint_dir:
        from ekaid_tpu.utils.checkpoint import (CheckpointManager,
                                                abstract_like)
        mgr = CheckpointManager(a.checkpoint_dir)
        trainer.state = mgr.restore(abstract_like(trainer.state),
                                    name=a.checkpoint)

    res = ask_question(trainer, a.index, a.question,
                       n_samples=a.n_samples)
    print("greedy:", res["greedy"])
    print("gt:", res["gt_answer"])
    for ans, n in sorted(res["counts"].items(), key=lambda kv: -kv[1]):
        print(f"{n:4d}  {ans}")
    if a.out:
        from ekaid_tpu.viz.draw import draw_answer_distribution
        draw_answer_distribution(res["counts"], save=a.out,
                                 title=a.question)
        print("saved", a.out)


if __name__ == "__main__":
    main()
