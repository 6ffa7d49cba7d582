"""End-to-end checkpoint-converter parity against the REFERENCE sources.

Unlike tests/test_torch_parity.py (which bit-checks the converter's atoms
against local torch replicas), this test imports the reference's actual
model code from /root/reference/model (modules.py:81 ChangeDetector,
dynamic_speaker_change_pos.py:139 DynamicSpeaker), random-inits it, saves
the exact checkpoint dict train_mimic.py:283-287 ships, runs
`tools.torch_convert.convert_checkpoint`, and asserts through EkaidModel:

  * encoder outputs (feat_bef/aft/diff, pred, att maps) ≤ 1e-4,
  * teacher-forced logprobs ≤ 1e-4 (test uses reduced dims — the mapping
    is name/layout-based, so shape size is irrelevant to coverage),
  * greedy-decode token ids exactly equal.

The reference is run with its OWN semantics — including the
QuestionSelfAttention transposed-softmax batch scramble, reproduced on
our side via `question.att_mode='reference'` (language.py) — so this is
the accuracy-parity proof available without MIMIC data: a migrating
user's converted `checkpoint_best.pt` decodes the same answers.

Reference deviations NOT exercised here (documented in docs/PARITY.md):
beam search (oracle-tested separately), scheduled sampling (stochastic).

torchvision is absent in this environment; modules.py imports it only
for the mode0 pixel path, so it is stubbed in sys.modules.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/model"

B, N, T = 3, 8, 12           # batch, nodes, decode steps
ATT_DIM = 64                 # node dim after projection
NTOK = 30                    # question vocab
VOCAB = 20                   # answer vocab
Q_LEN = 6
RNN = 512                    # reference DynamicCore hardcodes pos1 at 512
EMB = 64                     # speaker.embed_dim == question hidden


class _AttrDict(dict):
    """Minimal attribute-access dict standing in for the reference's
    config AttrDict (utils/attr_dict.py) — supports cfg.a.b and .get."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _ref_cfg():
    d = _AttrDict
    return d(
        model=d(
            change_detector=d(
                input_dim=2052, dim=32, feat_dim=ATT_DIM + 2,
                att_dim=ATT_DIM, att_head=4, nongt_dim=N,
                spa_label_num=11, sem_label_num=3, dir_num=2,
                pos_emb_dim=64, coef_sem=0.333, coef_spa=0.333),
            speaker=d(
                input_dim=ATT_DIM, rnn_size=RNN,
                embed_input_dim=3 * ATT_DIM, embed_dim=EMB,
                drop_prob_lm=0.5, word_embed_size=32, vocab_size=VOCAB,
                seq_length=T, beam_size=1, temperature=1.0),
        ),
        train=d(setting="mode2", graph="all"),
        data=d(feature_mode="both", train=d(empty_image=False)),
    )


@pytest.fixture(scope="module")
def ref():
    """Import the reference model sources (namespace packages under
    /root/reference/model) with torchvision stubbed."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not present")
    for name in ("torchvision", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.path.append(REF)
    import models.modules as ref_modules
    import models.dynamic_speaker_change_pos as ref_speaker

    # The reference hardcodes CUDA in three spots; run it on CPU without
    # touching the read-only tree:
    #  * graph_att_layer.py:131 `torch.FloatTensor([1e-6]).cuda()` —
    #    make .cuda() a no-op for this test process;
    #  * mimic_utils.py:193 torch_extract_position_embedding defaults
    #    device='cuda' — rebind modules.py's imported name to a CPU
    #    partial.
    torch.Tensor.cuda = lambda self, *a, **k: self
    import functools
    ref_modules.torch_extract_position_embedding = functools.partial(
        ref_modules.torch_extract_position_embedding,
        device=torch.device("cpu"))
    return ref_modules, ref_speaker


@pytest.fixture(scope="module")
def converted(ref, tmp_path_factory):
    """Random-init reference model → checkpoint file → convert."""
    ref_modules, ref_speaker = ref
    torch.manual_seed(1238)
    cfg = _ref_cfg()
    word_to_idx = {f"w{i}": i for i in range(NTOK)}
    cd = ref_modules.ChangeDetector(cfg, word_to_idx)
    spk = ref_speaker.DynamicSpeaker(cfg, VOCAB)
    cd.eval()
    spk.eval()

    path = tmp_path_factory.mktemp("ckpt") / "checkpoint_best.pt"
    torch.save({"change_detector_state": cd.state_dict(),
                "speaker_state": spk.state_dict()}, path)

    from ekaid_tpu.tools.torch_convert import convert_checkpoint
    import jax
    import jax.numpy as jnp
    variables = jax.tree.map(jnp.asarray, convert_checkpoint(str(path)))
    return cfg, cd, spk, variables


def _our_model():
    from ekaid_tpu.config import default_config
    c = default_config()
    c = c.replace(
        change_detector=c.change_detector.replace(
            dim=32, att_dim=ATT_DIM, nongt_dim=N, feat_dim=ATT_DIM + 2),
        speaker=c.speaker.replace(
            input_dim=ATT_DIM, rnn_size=RNN, embed_input_dim=3 * ATT_DIM,
            embed_dim=EMB, word_embed_size=32, vocab_size=VOCAB,
            seq_length=T),
        question=c.question.replace(att_mode="reference"),
        data=c.data.replace(num_nodes=N),
    )
    from ekaid_tpu.models.ekaid import EkaidModel
    return EkaidModel(c, ntoken=NTOK)


def _batch(rng_seed=0):
    r = np.random.default_rng(rng_seed)
    def boxes():
        x1 = r.uniform(0, 0.5, (B, N, 1)); y1 = r.uniform(0, 0.5, (B, N, 1))
        w = r.uniform(0.1, 0.5, (B, N, 1)); h = r.uniform(0.1, 0.5, (B, N, 1))
        return np.concatenate([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    return {
        "d_feats": r.normal(size=(B, N, ATT_DIM)).astype(np.float32),
        "q_feats": r.normal(size=(B, N, ATT_DIM)).astype(np.float32),
        "d_adj": r.integers(0, 12, (B, N, N)).astype(np.int32),
        "q_adj": r.integers(0, 12, (B, N, N)).astype(np.int32),
        "d_sem_adj": r.integers(0, 4, (B, N, N)).astype(np.int32),
        "q_sem_adj": r.integers(0, 4, (B, N, N)).astype(np.int32),
        "d_bb": boxes(), "q_bb": boxes(),
        "question": r.integers(0, NTOK, (B, Q_LEN)).astype(np.int32),
        # labels: <start>=2 then nonzero tokens (no all-zero column, so the
        # reference's early break at :213-214 never fires)
        "labels": np.concatenate(
            [np.full((B, 1), 2), r.integers(1, VOCAB, (B, T))],
            axis=1).astype(np.int32),
        "masks": np.ones((B, T + 1), np.float32),
    }


def _ref_forward(cfg, cd, spk, batch):
    """Drive the reference exactly as test_mimic.py:92-124 does."""
    sys.path.append(REF)
    from utils.mimic_utils import process_matrix
    t = lambda x: torch.from_numpy(np.asarray(x))  # noqa: E731
    dev = torch.device("cpu")
    d_adj = process_matrix(t(batch["d_adj"]).long(), cfg, N, dev,
                           type="spatial")
    q_adj = process_matrix(t(batch["q_adj"]).long(), cfg, N, dev,
                           type="spatial")
    d_sem = process_matrix(t(batch["d_sem_adj"]).long(), cfg, N, dev,
                           type="semantic")
    q_sem = process_matrix(t(batch["q_sem_adj"]).long(), cfg, N, dev,
                           type="semantic")
    with torch.no_grad():
        pred, att_bef, att_aft, feat_bef, feat_aft, feat_diff = cd(
            t(batch["d_feats"]), t(batch["q_feats"]), d_adj, q_adj,
            d_sem, q_sem, t(batch["d_bb"]), t(batch["q_bb"]),
            t(batch["question"]).long(), setting="mode2", graph="all")
        logprobs, _ = spk._forward(feat_bef, feat_aft, feat_diff,
                                   t(batch["labels"]).long())
        seq, seq_lp = spk._sample(feat_bef, feat_aft, feat_diff, None,
                                  cfg=cfg, sample_max=1)
    return {"pred": pred.numpy(), "att_bef": att_bef.numpy(),
            "att_aft": att_aft.numpy(), "feat_bef": feat_bef.numpy(),
            "feat_aft": feat_aft.numpy(), "feat_diff": feat_diff.numpy(),
            "logprobs": logprobs.numpy(), "seq": seq.numpy(),
            "seq_logprobs": seq_lp.numpy()}


def test_full_checkpoint_convert_parity(converted):
    cfg, cd, spk, variables = converted
    batch = _batch()
    ref_out = _ref_forward(cfg, cd, spk, batch)

    import jax
    import jax.numpy as jnp
    model = _our_model()
    jbatch = jax.tree.map(jnp.asarray, batch)

    out = model.apply(variables, jbatch, train=False)
    # encoder parity first (localizes failures to encoder vs speaker)
    for k in ("feat_bef", "feat_aft", "feat_diff", "pred",
              "att_bef", "att_aft"):
        np.testing.assert_allclose(
            np.asarray(out[k]), ref_out[k], atol=1e-4, rtol=1e-4,
            err_msg=f"encoder output {k} diverged after conversion")

    # teacher-forced logprobs ≤ 1e-4 (the converter's end-to-end proof)
    np.testing.assert_allclose(
        np.asarray(out["logprobs"]), ref_out["logprobs"],
        atol=1e-4, rtol=1e-3, err_msg="teacher-forced logprobs diverged")

    # greedy decode: token ids must match EXACTLY
    dec = model.apply(variables, jbatch, method="decode", sample_max=True)
    np.testing.assert_array_equal(
        np.asarray(dec["seq"]), ref_out["seq"],
        err_msg="greedy decode tokens diverged after conversion")
    # and the taken-token logprobs agree where tokens were emitted
    emitted = ref_out["seq"] > 0
    np.testing.assert_allclose(
        np.asarray(dec["logprobs"])[emitted],
        ref_out["seq_logprobs"][emitted], atol=1e-4, rtol=1e-3)


def test_reference_att_mode_differs_from_fixed(converted):
    """Guard that att_mode='reference' is actually exercising the scramble
    (i.e. the parity above is not vacuous): the fixed per-sample softmax
    must produce different encoder outputs on a batch > 1."""
    cfg, cd, spk, variables = converted
    batch = _batch()
    import jax
    import jax.numpy as jnp
    jbatch = jax.tree.map(jnp.asarray, batch)

    model_ref = _our_model()
    cfg_fixed = model_ref.cfg.replace(
        question=model_ref.cfg.question.replace(att_mode="fixed"))
    from ekaid_tpu.models.ekaid import EkaidModel
    model_fixed = EkaidModel(cfg_fixed, ntoken=NTOK)

    a = model_ref.apply(variables, jbatch, method="encode")
    b = model_fixed.apply(variables, jbatch, method="encode")
    assert float(np.abs(np.asarray(a["feat_diff"])
                        - np.asarray(b["feat_diff"])).max()) > 1e-6
