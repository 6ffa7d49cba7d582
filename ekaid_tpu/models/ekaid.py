"""Full difference-VQA model: ChangeDetector + DynamicSpeaker in one module.

This is the single XLA program the reference assembles from two separately
driven torch modules (train_mimic.py:229-247: change_detector forward →
speaker._forward → losses). Batches are dicts of padded, fixed-shape
tensors (SURVEY.md §7 step 1):

  d_feats / q_feats   [B, N, feat]   main/reference node features
  d_adj / q_adj       [B, P, P] int  spatial adjacency labels 0..11
  d_sem_adj / …       [B, P, P] int  semantic adjacency labels 0..2
  d_bb / q_bb         [B, N, 4]      normalized boxes
  question            [B, Lq] int
  labels              [B, T+1] int   <start> + answer tokens (train only)
  masks               [B, T+1]       1 over tokens + the EOS slot

The adjacency one-hot broadcast (process_matrix, mimic_utils.py:141-149),
which the reference re-runs on device every step, happens inside the jit
where XLA folds it into the consuming einsum.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.change_detector import ChangeDetector
from ekaid_tpu.models.decoder import DynamicSpeaker
from ekaid_tpu.ops.graph import broadcast_adjacency
from ekaid_tpu.utils.dtypes import Policy, F32


class EkaidModel(nn.Module):
    cfg: Any                      # full Config
    ntoken: int                   # len(word_to_idx) — question vocab
    policy: Policy = F32
    # jax.sharding.Mesh: enables the pallas decode kernel on sharded
    # eval (shard_map over 'data'); None keeps single-device behavior
    decode_mesh: Any = None

    def setup(self):
        c = self.cfg
        self.change_detector = ChangeDetector(
            c.change_detector, speaker_embed_dim=c.speaker.embed_dim,
            ntoken=self.ntoken, graph=c.train.graph,
            setting=c.train.setting,
            question_att=getattr(c.question, "att_mode", "fixed"),
            policy=self.policy, name="change_detector")
        self.speaker = DynamicSpeaker(c.speaker, policy=self.policy,
                                      decode_mesh=self.decode_mesh,
                                      name="speaker")

    def _adjacencies(self, batch):
        c = self.cfg.change_detector
        n = batch["d_feats"].shape[1]
        dt = self.policy.compute_dtype
        return (
            broadcast_adjacency(batch["d_adj"], c.spa_label_num, n, dt),
            broadcast_adjacency(batch["q_adj"], c.spa_label_num, n, dt),
            broadcast_adjacency(batch["d_sem_adj"], c.sem_label_num, n, dt),
            broadcast_adjacency(batch["q_sem_adj"], c.sem_label_num, n, dt),
        )

    def encode(self, batch, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.cfg.train.setting == "mode0":
            # pixels-in: no precomputed graph (modules.py:179-189)
            return self.change_detector(
                batch["d_feats"], batch["q_feats"], None, None, None,
                None, None, None, batch["question"], train=train)
        d_adj, q_adj, d_sem, q_sem = self._adjacencies(batch)
        return self.change_detector(
            batch["d_feats"], batch["q_feats"], d_adj, q_adj, d_sem, q_sem,
            batch["d_bb"], batch["q_bb"], batch["question"], train=train)

    def __call__(self, batch, ss_prob: float = 0.0, train: bool = False):
        """Training/teacher-forced path; returns encoder + speaker outputs."""
        enc = self.encode(batch, train=train)
        dec = self.speaker.teacher_forcing(
            enc["feat_bef"], enc["feat_aft"], enc["feat_diff"],
            batch["labels"], ss_prob=ss_prob, train=train)
        return {**enc, **dec}

    def decode(self, batch, sample_max: bool = True,
               temperature: Optional[float] = None,
               rng: Optional[jax.Array] = None,
               early_exit: bool = True):
        """Eval/inference path (test_mimic.py:116-119 parity)."""
        enc = self.encode(batch, train=False)
        dec = self.speaker.sample(
            enc["feat_bef"], enc["feat_aft"], enc["feat_diff"],
            sample_max=sample_max, temperature=temperature, rng=rng,
            early_exit=early_exit)
        return {**enc, **dec}

    def decode_beam(self, batch, beam_size: int = 3,
                    group_size: Optional[int] = None,
                    diversity_lambda: Optional[float] = None):
        """Beam-search eval path (the reference's _sample dispatches to
        _sample_beam when beam_size > 1, :299-301); group_size > 1
        enables diverse groups (CaptionModel.py:34-50)."""
        enc = self.encode(batch, train=False)
        dec = self.speaker.sample_beam(
            enc["feat_bef"], enc["feat_aft"], enc["feat_diff"],
            beam_size=beam_size, group_size=group_size,
            diversity_lambda=diversity_lambda)
        return {**enc, **dec}


def language_model_loss(logprobs, targets, masks,
                        denom=None) -> jnp.ndarray:
    """Masked NLL (LanguageModelCriterion, model/utils/utils.py:204-216):
    -sum(logp[target] * mask) / sum(mask).

    logprobs: [B, T, V]; targets/masks: [B, >=T] (truncated to T).
    denom: overrides the mask-sum normalizer — used by gradient
    accumulation, where each microbatch divides by the FULL batch's
    mask sum so the microbatch losses sum exactly to the batch loss.
    """
    T = logprobs.shape[1]
    targets = targets[:, :T]
    masks = masks[:, :T].astype(logprobs.dtype)
    picked = jnp.take_along_axis(logprobs, targets[..., None],
                                 axis=-1)[..., 0]
    if denom is None:
        denom = jnp.maximum(jnp.sum(masks), 1.0)
    return -jnp.sum(picked * masks) / denom


def attention_regularizer(att_bef, att_aft, batch=None) -> jnp.ndarray:
    """Sigmoid-attention sparsity term (train_mimic.py:246-247):
    (sum(att_bef) + sum(att_aft)) / (2 * batch).

    batch: overrides the normalizing batch size (gradient accumulation
    passes the full batch size to each microbatch term)."""
    b = att_bef.shape[0] if batch is None else batch
    return (jnp.sum(att_bef.astype(jnp.float32))
            + jnp.sum(att_aft.astype(jnp.float32))) / (2.0 * b)


def entropy_loss(module_weights, masks, batch=None) -> jnp.ndarray:
    """Module-attention entropy term (EntropyLoss, utils/utils.py:218-232
    — defined in the reference, wired but commented out at
    train_mimic.py:171,245; activated here via train.entropy_weight,
    default 0 = the reference's effective behavior).

    module_weights: [B, T, 3] softmax weights; masks: [B, >=T].
    batch: full-batch normalizer override (gradient accumulation)."""
    t = module_weights.shape[1]
    m = masks[:, :t].astype(jnp.float32)
    w = module_weights.astype(jnp.float32)
    b = w * jnp.log(jnp.maximum(w, 1e-12))
    denom = module_weights.shape[0] if batch is None else batch
    return -jnp.sum(b * m[..., None]) / denom


def reward_loss(logprobs_taken, seq, reward) -> jnp.ndarray:
    """SCST-style policy-gradient loss (RewardCriterion,
    utils/utils.py:190-202; unused by the reference's training but part
    of its loss surface). logprobs_taken/reward: [B, T]; seq: [B, T]."""
    mask = (seq > 0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones_like(mask[:, :1]), mask[:, :-1]],
                           axis=1)
    out = -logprobs_taken * reward * mask
    return jnp.sum(out) / jnp.maximum(jnp.sum(mask), 1.0)


def total_loss(outputs, batch, att_reg_weight: float = 2.5e-3,
               entropy_weight: float = 0.0,
               lang_denom=None, batch_denom=None):
    """train_mimic.py:242-247: NLL over labels[:, 1:] + attention term.

    entropy_weight > 0 subtracts the module-attention entropy bonus
    (the reference's commented-out `-entropy_weight * EntropyLoss`,
    train_mimic.py:244; 0 = shipped behavior, term absent).

    lang_denom/batch_denom: full-batch normalizers for gradient
    accumulation (train/step.py) — with them, per-microbatch losses
    (and by linearity their grads) sum exactly to the batch loss."""
    lang = language_model_loss(outputs["logprobs"], batch["labels"][:, 1:],
                               batch["masks"][:, 1:], denom=lang_denom)
    att = attention_regularizer(outputs["att_bef"], outputs["att_aft"],
                                batch=batch_denom)
    loss = lang + att_reg_weight * att
    aux = {"speaker_loss": lang, "att_reg": att}
    if entropy_weight:
        ent = entropy_loss(outputs["module_weights"],
                           batch["masks"][:, 1:], batch=batch_denom)
        loss = loss - entropy_weight * ent
        aux["entropy"] = ent
    return loss, aux
