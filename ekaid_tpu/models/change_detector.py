"""Graph change encoder (ChangeDetector parity, model/models/modules.py:81-313).

Pipeline (mode2, the only functional region-feature path in the reference —
modes 1/3/4 reference a never-instantiated `self.graph_relation` and would
crash there):

  1. project 1024-d node features (`self.img`, modules.py:93,195-196);
  2. encode the question (WordEmbedding → GRU → self-attention,
     modules.py:201-206);
  3. run the semantic / spatial / implicit relation encoders over each
     image's 52-node graph (modules.py:216-232);
  4. diff = aft − bef (modules.py:250);
  5. gated context fusion (tanh/sigmoid gates, modules.py:278-288);
  6. per-node sigmoid attention pooling → attended_1/2 and the pooled
     difference `input_attended` (modules.py:300-310);
  7. an auxiliary 6-way head `fc1` (modules.py:115,310 — never used by the
     loss; kept for API parity).

Branch combination (`branch_mix`):
  'sequential' (default) is faithful to the reference as *executed*: the
  in-place residual `exp_v += exp_v_rel` (relation_encoder.py:129,81)
  aliases the projected input, so the three encoders run as cumulative
  residuals — semantic output feeds spatial, spatial feeds implicit — and
  the coef_sem/coef_spa mix (modules.py:233-235) collapses to identity
  (verified empirically with torch aliasing semantics).
  'parallel' implements the apparent intent: independent branches mixed
  with coef_sem/coef_spa/(1-sem-spa).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.models.gat import (ExplicitRelationEncoder,
                                  ImplicitRelationEncoder)
from ekaid_tpu.models.language import QuestionEncoder
from ekaid_tpu.models.layers import DenseT, dropout
from ekaid_tpu.ops.graph import position_embedding, position_matrix
from ekaid_tpu.utils.dtypes import Policy, F32


class SelfAttention(nn.Module):
    """Multi-head self-attention with output LayerNorm (modules.py:17-77,
    the SSRE block used by the pixels-in mode0 path). Inputs are the
    question-concatenated node features (dim = 2*att_dim), outputs
    att_dim."""

    att_dim: int
    num_heads: int
    dropout: float = 0.1
    policy: Policy = F32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, train: bool = False):
        assert self.att_dim % self.num_heads == 0, (
            f"The hidden size ({self.att_dim}) is not a multiple of the "
            f"number of attention heads ({self.num_heads})")
        H = self.num_heads
        dh = self.att_dim // H
        B, L, _ = q_in.shape
        q = DenseT(self.att_dim, policy=self.policy, name="query")(q_in)
        k = DenseT(self.att_dim, policy=self.policy, name="key")(k_in)
        v = DenseT(self.att_dim, policy=self.policy, name="value")(v_in)
        qh = q.reshape(B, L, H, dh)
        kh = k.reshape(B, -1, H, dh)
        vh = v.reshape(B, -1, H, dh)
        att = jnp.einsum("blhd,bmhd->bhlm", qh, kh,
                         preferred_element_type=self.policy.compute_dtype)
        att = jax.nn.softmax(
            self.policy.cast_softmax(att) / (dh ** 0.5), axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        ctx = jnp.einsum("bhlm,bmhd->blhd", self.policy.cast_compute(att),
                         vh, preferred_element_type=self.policy.compute_dtype)
        ctx = ctx.reshape(B, L, self.att_dim)
        return nn.LayerNorm(epsilon=1e-6,
                            dtype=self.policy.compute_dtype)(ctx)


class PixelEncoder(nn.Module):
    """Pixels-in front end (mode0): CNN trunk → per-cell nodes
    (modules.py:153-160,179-189 — torchvision resnet101 minus head,
    then fc_reshape 2048→att_dim and flatten h*w into the node axis).
    Depths (3,4,23,3) = ResNet-101."""

    att_dim: int
    norm: str = "gn"
    policy: Policy = F32

    @nn.compact
    def __call__(self, images):
        from ekaid_tpu.models.detector.backbone import ResNet
        if images.ndim == 3:                       # [B, H, W] grayscale
            images = jnp.repeat(images[..., None], 3, axis=-1)
        feats = ResNet(depths=(3, 4, 23, 3), norm=self.norm,
                       policy=self.policy, name="trunk")(images)
        c5 = feats["c5"]                           # [B, h, w, 2048]
        x = DenseT(self.att_dim, policy=self.policy, name="fc_reshape")(
            self.policy.cast_compute(c5))
        return x.reshape(x.shape[0], -1, self.att_dim)


class ChangeDetector(nn.Module):
    cfg: Any                      # ChangeDetectorConfig
    speaker_embed_dim: int        # q_dim for relation encoders (yaml:20)
    ntoken: int                   # question vocab size (len(word_to_idx))
    graph: str = "all"            # all | semantic | spatial | implicit | i+s
    setting: str = "mode2"        # mode2 = region features, mode0 = pixels
    question_att: str = "fixed"   # QuestionConfig.att_mode (language.py)
    policy: Policy = F32

    def setup(self):
        c = self.cfg
        self.img = DenseT(c.att_dim, policy=self.policy, name="img")
        if self.setting == "mode0":
            self.extractor = PixelEncoder(c.att_dim, policy=self.policy,
                                          name="extractor")
            self.ssre = SelfAttention(c.att_dim, c.att_head,
                                      policy=self.policy, name="SSRE")
        self.question = QuestionEncoder(
            self.ntoken, hidden_dim=self.speaker_embed_dim,
            att_mode=self.question_att,
            policy=self.policy, name="question")

        common = dict(v_dim=c.att_dim, q_dim=self.speaker_embed_dim,
                      out_dim=c.att_dim, dir_num=c.dir_num,
                      nongt_dim=c.nongt_dim, num_heads=c.att_head,
                      dir_reduce=c.dir_reduce, policy=self.policy)
        if self.setting == "mode2":    # mode0 uses SSRE, no GAT encoders
            if self.graph in ("all", "semantic"):
                self.semantic_relation = ExplicitRelationEncoder(
                    label_num=c.sem_label_num, name="semantic_relation",
                    **common)
            if self.graph in ("all", "spatial", "i+s"):
                self.spatial_relation = ExplicitRelationEncoder(
                    label_num=c.spa_label_num, name="spatial_relation",
                    **common)
            if self.graph in ("all", "implicit", "i+s"):
                self.imp_relation = ImplicitRelationEncoder(
                    pos_emb_dim=c.pos_emb_dim, name="imp_relation",
                    **{k: v for k, v in common.items()})

        self.context1 = DenseT(c.att_dim, use_bias=False, policy=self.policy,
                               name="context1")
        self.context2 = DenseT(c.att_dim, policy=self.policy,
                               name="context2")
        self.gate1 = DenseT(c.att_dim, use_bias=False, policy=self.policy,
                            name="gate1")
        self.gate2 = DenseT(c.att_dim, policy=self.policy, name="gate2")
        self.embed = DenseT(c.dim, policy=self.policy, name="embed")
        self.att = DenseT(1, policy=self.policy, name="att")
        self.fc1 = DenseT(6, policy=self.policy, name="fc1")

    def _position_emb(self, bb):
        pos_mat = position_matrix(bb, nongt_dim=self.cfg.nongt_dim)
        return position_embedding(pos_mat, feat_dim=self.cfg.pos_emb_dim)

    def _encode_image(self, v, spa_adj, sem_adj, pos_emb, q,
                      train: bool) -> jnp.ndarray:
        """Relation encoding for one image's node set."""
        c = self.cfg
        if c.branch_mix == "sequential":
            if self.graph in ("all", "semantic"):
                v = self.semantic_relation(v, sem_adj, q, train=train)
            if self.graph in ("all", "spatial", "i+s"):
                v = self.spatial_relation(v, spa_adj, q, train=train)
            if self.graph in ("all", "implicit", "i+s"):
                v = self.imp_relation(v, pos_emb, q, train=train)
            return v
        elif c.branch_mix == "parallel":
            outs = []
            coefs = []
            if self.graph in ("all", "semantic"):
                outs.append(self.semantic_relation(v, sem_adj, q,
                                                   train=train))
                coefs.append(c.coef_sem)
            if self.graph in ("all", "spatial", "i+s"):
                outs.append(self.spatial_relation(v, spa_adj, q,
                                                  train=train))
                coefs.append(c.coef_spa)
            if self.graph in ("all", "implicit", "i+s"):
                outs.append(self.imp_relation(v, pos_emb, q, train=train))
                coefs.append(1.0 - sum(coefs))
            if self.graph == "all":
                return sum(w * o for w, o in zip(coefs, outs))
            if self.graph == "i+s":
                return sum(outs) / len(outs)
            return outs[0]
        raise ValueError(f"unknown branch_mix {c.branch_mix!r}")

    def __call__(self, input_1, input_2, d_adj, q_adj, d_sem_adj, q_sem_adj,
                 d_bb, q_bb, question, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """
        input_1/2:        [B, N, feat] node features (bef = main, aft = ref)
        d_adj/q_adj:      [B, N, N, spa_label_num] one-hot spatial adjacency
        d_sem_adj/…:      [B, N, N, sem_label_num] one-hot semantic adjacency
        d_bb/q_bb:        [B, N, 4] normalized boxes
        question:         [B, Lq] int tokens

        Returns dict: pred [B,6], att_bef/att_aft [B,1,N],
        feat_bef/feat_aft/feat_diff [B, att_dim].
        """
        c = self.cfg
        cast = self.policy.cast_compute
        if train:
            dkeys = list(jax.random.split(self.make_rng("dropout"), 6))
        else:
            dkeys = [None] * 6
        drop = lambda x: dropout(x, 0.5, dkeys.pop())  # noqa: E731

        if self.setting == "mode0":
            # pixels-in: CNN cells become the node axis
            # (modules.py:179-189,267-275)
            input_1 = self.extractor(cast(input_1))
            input_2 = self.extractor(cast(input_2))

        input_bef = self.img(cast(input_1))
        input_aft = self.img(cast(input_2))

        q_vec = self.question(question, train=train)

        if self.setting == "mode0":
            from ekaid_tpu.models.gat import q_expand_v_cat
            bef2 = q_expand_v_cat(q_vec, input_bef)
            aft2 = q_expand_v_cat(q_vec, input_aft)
            input_bef = self.ssre(bef2, bef2, bef2, train=train)
            input_aft = self.ssre(aft2, aft2, aft2, train=train)
        else:
            pos_bef = self._position_emb(d_bb) if self.graph in (
                "all", "implicit", "i+s") else None
            pos_aft = self._position_emb(q_bb) if self.graph in (
                "all", "implicit", "i+s") else None
            pb = c.pair_batch
            if pb is True or pb == "on" or (pb == "train" and train):
                # One [2B, …] pass through the shared-weight encoder
                # stack instead of two sequential [B, …] passes
                # (modules.py:216-232 runs the stack once per image).
                # Per-sample math is batch-row independent, so eval is
                # bit-identical to the two-pass path; train differs
                # only in the dropout mask draw (tests/test_model.py).
                # 'train' applies the fold to the train step only —
                # see the config.py knob comment for the measured
                # shape-dependence that motivates the split.
                B = input_bef.shape[0]
                enc = self._encode_image(
                    jnp.concatenate([input_bef, input_aft], axis=0),
                    jnp.concatenate([d_adj, q_adj], axis=0),
                    jnp.concatenate([d_sem_adj, q_sem_adj], axis=0),
                    None if pos_bef is None else jnp.concatenate(
                        [pos_bef, pos_aft], axis=0),
                    jnp.concatenate([q_vec, q_vec], axis=0), train)
                input_bef, input_aft = enc[:B], enc[B:]
            else:
                input_bef = self._encode_image(input_bef, d_adj, d_sem_adj,
                                               pos_bef, q_vec, train)
                input_aft = self._encode_image(input_aft, q_adj, q_sem_adj,
                                               pos_aft, q_vec, train)
        input_diff = input_aft - input_bef

        # gated context fusion (modules.py:278-288)
        ctx_d = self.context1(input_diff)
        gate_d = self.gate1(input_diff)
        befs = drop(nn.sigmoid(gate_d + self.gate2(input_bef))) * \
            drop(jnp.tanh(ctx_d + self.context2(input_bef)))
        afts = drop(nn.sigmoid(gate_d + self.gate2(input_aft))) * \
            drop(jnp.tanh(ctx_d + self.context2(input_aft)))

        # attention pooling (modules.py:297-309); embed = Linear→Dropout→ReLU
        emb_bef = nn.relu(drop(self.embed(jnp.concatenate(
            [input_bef, input_diff, befs], axis=-1))))
        emb_aft = nn.relu(drop(self.embed(jnp.concatenate(
            [input_aft, input_diff, afts], axis=-1))))
        att_bef = nn.sigmoid(
            self.policy.cast_softmax(self.att(emb_bef)))     # [B, N, 1]
        att_aft = nn.sigmoid(
            self.policy.cast_softmax(self.att(emb_aft)))

        attended_1 = jnp.sum(input_bef * cast(att_bef), axis=1)  # [B, D]
        attended_2 = jnp.sum(input_aft * cast(att_aft), axis=1)
        input_attended = attended_2 - attended_1
        pred = self.fc1(input_attended)

        return {
            "pred": pred,
            "att_bef": jnp.swapaxes(att_bef, 1, 2),   # [B, 1, N] parity
            "att_aft": jnp.swapaxes(att_aft, 1, 2),
            "feat_bef": attended_1,
            "feat_aft": attended_2,
            "feat_diff": input_attended,
        }
