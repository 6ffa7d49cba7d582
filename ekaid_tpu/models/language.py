"""Question encoding: dual word embedding → GRU → self-attention pooling.

Parity target: model/models/language_model.py —
  * WordEmbedding (:17-53): two [ntoken+1, 300] tables (op 'c'), the second
    frozen, concatenated to 600-d; padding row is index `ntoken`
    (questions are 0-padded, so row 0 stays trainable — a reference quirk
    preserved here).
  * QuestionEmbedding (:56-115): 1-layer unidirectional GRU, 1024-d,
    zero initial state; `forward_all` returns every step.
  * QuestionSelfAttention (:118-156): FCNet(H→H, dropout .2) → tanh →
    FCNet(H→1) scores, softmax over tokens, weighted sum, dropout.

DOCUMENTED DEVIATION: the reference softmaxes the *transposed* score
matrix over its batch axis and reshapes across batch rows
(language_model.py:149) — an upstream VQA_ReGAT bug that mixes attention
weights across unrelated samples in the batch (and degenerates to
all-ones weights at batch size 1; verified empirically against torch).
Batch-coupled semantics cannot hold under data parallelism, so this
module implements the intended per-sample softmax over tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.layers import FCNet, GRU, embedding_init_normal
from ekaid_tpu.utils.dtypes import Policy, F32


class WordEmbedding(nn.Module):
    ntoken: int
    emb_dim: int = 300
    dropout: float = 0.0
    policy: Policy = F32

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        init = embedding_init_normal(padding_idx=self.ntoken)
        emb = self.param("emb", init, (self.ntoken + 1, self.emb_dim),
                         self.policy.param_dtype)
        emb_fixed = self.param("emb_fixed", init,
                               (self.ntoken + 1, self.emb_dim),
                               self.policy.param_dtype)
        # second table is frozen (emb_.weight.requires_grad = False,
        # language_model.py:29)
        out = jnp.concatenate(
            [emb[tokens], jax.lax.stop_gradient(emb_fixed)[tokens]], axis=-1)
        out = self.policy.cast_compute(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class QuestionSelfAttention(nn.Module):
    num_hid: int
    dropout: float = 0.2
    # 'fixed' = per-sample softmax over tokens (the documented deviation,
    # module docstring); 'reference' = the upstream transposed-softmax
    # batch scramble of language_model.py:149, bit-exact: softmax the
    # [L, B] transposed score matrix over B, then reinterpret its
    # row-major bytes as [B, L] (torch's .view on the contiguous softmax
    # output). Single-device / conversion-validation only.
    att_mode: str = "fixed"
    policy: Policy = F32

    @nn.compact
    def __call__(self, ques_feat, train: bool = False):
        """ques_feat: [B, L, H] -> [B, H]."""
        a1 = FCNet([self.num_hid, self.num_hid], act=None,
                   dropout=self.dropout, policy=self.policy)(
                       ques_feat, train=train)
        a1 = jnp.tanh(a1)
        scores = FCNet([self.num_hid, 1], act=None,
                       policy=self.policy)(a1, train=train)[..., 0]  # [B, L]
        if self.att_mode == "reference":
            B, L = scores.shape
            wt = jax.nn.softmax(self.policy.cast_softmax(scores).T,
                                axis=1)                        # [L, B] over B
            w = wt.reshape(B, L)          # row-major scramble (.view parity)
        else:
            w = jax.nn.softmax(self.policy.cast_softmax(scores), axis=-1)
        pooled = jnp.einsum("bl,blh->bh", self.policy.cast_compute(w),
                            ques_feat)
        return nn.Dropout(self.dropout, deterministic=not train)(pooled)


class QuestionEncoder(nn.Module):
    """word emb → GRU → self-att pooling; returns the pooled [B, H] vector
    (q_emb_self_att in modules.py:201-206)."""

    ntoken: int
    word_emb_dim: int = 300
    hidden_dim: int = 1024
    dropout_word: float = 0.0
    dropout_att: float = 0.2
    att_mode: str = "fixed"      # see QuestionSelfAttention
    policy: Policy = F32

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        w = WordEmbedding(self.ntoken, self.word_emb_dim,
                          self.dropout_word, policy=self.policy)(
                              tokens, train=train)
        seq = GRU(self.hidden_dim, policy=self.policy)(w)   # [B, L, H]
        return QuestionSelfAttention(self.hidden_dim, self.dropout_att,
                                     att_mode=self.att_mode,
                                     policy=self.policy)(seq, train=train)
