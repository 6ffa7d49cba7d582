"""Relation-aware graph attention over the 52-node difference graph.

Parity targets (Microsoft VQA_ReGAT lineage):
  * GraphSelfAttentionLayer — model/models/graph_att_layer.py:19-178.
    Multi-head QK attention over the first `nongt_dim` nodes; values are
    the *raw* node features (no V projection, :102); optional geometric
    bias log(max(relu(W·pos_emb), 1e-6)) for the implicit relation
    (:113-135); non-edges masked to -9e15 then a per-edge label bias added
    (:137-154); head outputs are full feat_dim vectors concatenated and
    mixed by a plain Linear (`linear_out_2`, :57,174 — the grouped-conv
    `linear_out_` is defined but unused in the reference and is not
    reproduced).
  * GAttNet — model/models/graph_att.py:17-106. Per-direction layers over
    the adjacency and its transpose, label-bias FCNet over the one-hot
    edge labels, self-loop projection of the question-conditioned input.

  dir_reduce='reference' reproduces graph_att.py:95-102 as *executed*:
  `output` is overwritten by each direction's result then doubled, so the
  final output is 2 × the direction-1 (transposed-adjacency) attention and
  direction-0 contributes nothing. Direction-0 compute is skipped here
  (numerically identical, half the FLOPs); its parameters are still
  created so switching modes never changes the checkpoint tree.
  dir_reduce='sum' implements the commented intent: self + dir0 + dir1.

  * Relation encoders — model/models/relation_encoder.py:32-132, including
    `q_expand_v_cat` (:19-29): the pooled question vector is concatenated
    to every node, zeroed for all-zero (padded/missing) nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.layers import DenseT, FCNet
from ekaid_tpu.utils.dtypes import Policy, F32

NEG_INF = -9e15


def q_expand_v_cat(q, v):
    """Concat pooled question to every node, masked on all-zero nodes
    (relation_encoder.py:19-29). q: [B, Q], v: [B, N, D] -> [B, N, D+Q]."""
    mask = (jnp.sum(v, axis=-1, keepdims=True) != 0)
    q_exp = jnp.broadcast_to(q[:, None, :], (v.shape[0], v.shape[1],
                                             q.shape[-1]))
    q_exp = jnp.where(mask, q_exp, 0)
    return jnp.concatenate([v, q_exp], axis=-1)


class GAttNet(nn.Module):
    dir_num: int
    label_num: int
    in_feat_dim: int
    out_feat_dim: int
    nongt_dim: int = 52
    dropout: float = 0.2
    label_bias: bool = False
    num_heads: int = 4
    pos_emb_dim: int = -1
    dir_reduce: str = "reference"
    policy: Policy = F32

    @nn.compact
    def __call__(self, v_feat, adj_onehot, pos_emb=None, train: bool = False):
        """
        v_feat:     [B, N, in_feat_dim] question-conditioned node features
        adj_onehot: [B, N, N, label_num] one-hot edge labels (all-ones
                    [B, N, N, 1] for the implicit relation)
        pos_emb:    [B, N, M, pos_emb_dim] or None
        """
        assert self.dir_num <= 2, "Got more than two directions in a graph."
        self_feat = FCNet([self.in_feat_dim, self.out_feat_dim], act="",
                          dropout=self.dropout, policy=self.policy,
                          name="self_weights")(v_feat, train=train)

        M = min(self.nongt_dim, v_feat.shape[1])
        bias_net = FCNet([self.label_num, 1], act="", dropout=0.0,
                         use_bias=self.label_bias, policy=self.policy,
                         name="bias")

        def run_dir(d: int):
            adj_d = adj_onehot if d == 0 else jnp.swapaxes(adj_onehot, 1, 2)
            adj_d = adj_d[:, :, :M, :]
            cond = jnp.sum(adj_d, axis=-1)
            lbias = bias_net(self.policy.cast_compute(adj_d),
                             train=train)[..., 0]
            layer = _GraphAttention(
                feat_dim=self.out_feat_dim, num_heads=self.num_heads,
                nongt_dim=self.nongt_dim, pos_emb_dim=self.pos_emb_dim,
                dropout=self.dropout, policy=self.policy,
                name=f"neighbor_net_{d}")
            return layer(self_feat, cond, pos_emb, lbias, train=train)

        if self.dir_reduce == "reference":
            # Faithful to graph_att.py:95-102: only the last direction
            # survives, doubled. Direction-0 params are materialized for a
            # stable checkpoint tree but its compute is skipped (its output
            # is discarded by the reference's overwrite).
            _GraphAttention(
                feat_dim=self.out_feat_dim, num_heads=self.num_heads,
                nongt_dim=self.nongt_dim, pos_emb_dim=self.pos_emb_dim,
                dropout=self.dropout, policy=self.policy,
                name="neighbor_net_0")
            out = 2.0 * run_dir(self.dir_num - 1)
        elif self.dir_reduce == "sum":
            out = self_feat
            for d in range(self.dir_num):
                out = out + run_dir(d)
        else:
            raise ValueError(f"unknown dir_reduce {self.dir_reduce!r}")

        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.relu(out)


class _GraphAttention(nn.Module):
    """Inner attention layer (GraphSelfAttentionLayer parity)."""

    feat_dim: int
    num_heads: int
    nongt_dim: int
    pos_emb_dim: int
    dropout: float
    policy: Policy = F32

    @nn.compact
    def __call__(self, roi_feat, cond_adj, pos_emb, label_bias,
                 train: bool = False):
        B, N, D = roi_feat.shape
        M = min(self.nongt_dim, N)
        H = self.num_heads
        dh = D // H
        cast = self.policy.cast_compute

        nongt_feat = roi_feat[:, :M]
        q = FCNet([D, D], act=None, dropout=self.dropout,
                  policy=self.policy, name="query")(roi_feat, train=train)
        k = FCNet([D, D], act=None, dropout=self.dropout,
                  policy=self.policy, name="key")(nongt_feat, train=train)

        qh = q.reshape(B, N, H, dh)
        kh = k.reshape(B, M, H, dh)
        aff = jnp.einsum("bnhd,bmhd->bnhm", qh, kh,
                         preferred_element_type=self.policy.compute_dtype)
        aff = self.policy.cast_softmax(aff) * (1.0 / (dh ** 0.5))

        if self.pos_emb_dim > 0:
            assert pos_emb is not None, (
                "position embedding required for implicit relation "
                "(graph_att.py:63-66)")
            pos_w = FCNet([self.pos_emb_dim, H], act=None,
                          dropout=self.dropout, policy=self.policy,
                          name="pair_pos_fc1")(cast(pos_emb), train=train)
            pos_w = nn.relu(self.policy.cast_softmax(pos_w))
            aff = aff + jnp.log(jnp.maximum(
                jnp.transpose(pos_w, (0, 1, 3, 2)), 1e-6))

        if cond_adj is not None:
            edge = cond_adj[:, :, None, :] > 0
            aff = jnp.where(edge, aff, NEG_INF)
            if label_bias is not None:
                aff = aff + self.policy.cast_softmax(
                    label_bias)[:, :, None, :]

        w = jax.nn.softmax(aff, axis=-1)
        out = jnp.einsum("bnhm,bmd->bnhd", cast(w), cast(nongt_feat),
                         preferred_element_type=self.policy.compute_dtype)
        out = out.reshape(B, N, H * D)
        return DenseT(self.feat_dim, policy=self.policy,
                      name="linear_out_2")(out)


class ExplicitRelationEncoder(nn.Module):
    """relation_encoder.py:87-132 (v_dim == out_dim ⇒ no v_transform)."""

    v_dim: int
    q_dim: int
    out_dim: int
    dir_num: int
    label_num: int
    nongt_dim: int = 52
    num_heads: int = 4
    dir_reduce: str = "reference"
    policy: Policy = F32

    @nn.compact
    def __call__(self, v, adj_onehot, q, train: bool = False):
        if self.v_dim != self.out_dim:
            v = FCNet([self.v_dim, self.out_dim], policy=self.policy,
                      name="v_transform")(v, train=train)
        v_cat_q = q_expand_v_cat(q, v)
        rel = GAttNet(self.dir_num, self.label_num,
                      self.out_dim + self.q_dim, self.out_dim,
                      nongt_dim=self.nongt_dim, label_bias=False,
                      num_heads=self.num_heads, pos_emb_dim=-1,
                      dir_reduce=self.dir_reduce, policy=self.policy,
                      name="gat")(v_cat_q, adj_onehot, train=train)
        return v + rel


class ImplicitRelationEncoder(nn.Module):
    """relation_encoder.py:32-84: fully-connected graph + geometric bias."""

    v_dim: int
    q_dim: int
    out_dim: int
    dir_num: int
    pos_emb_dim: int = 64
    nongt_dim: int = 52
    num_heads: int = 4
    dir_reduce: str = "reference"
    policy: Policy = F32

    @nn.compact
    def __call__(self, v, pos_emb, q, train: bool = False):
        if self.v_dim != self.out_dim:
            v = FCNet([self.v_dim, self.out_dim], policy=self.policy,
                      name="v_transform")(v, train=train)
        B, N = v.shape[0], v.shape[1]
        ones_adj = jnp.ones((B, N, N, 1), self.policy.compute_dtype)
        v_cat_q = q_expand_v_cat(q, v)
        rel = GAttNet(self.dir_num, 1,
                      self.out_dim + self.q_dim, self.out_dim,
                      nongt_dim=self.nongt_dim, label_bias=False,
                      num_heads=self.num_heads, pos_emb_dim=self.pos_emb_dim,
                      dir_reduce=self.dir_reduce, policy=self.policy,
                      name="gat")(v_cat_q, ones_adj, pos_emb, train=train)
        return v + rel
