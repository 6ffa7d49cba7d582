"""ResNet-50 + FPN backbone in flax.

Architecture parity with the reference's Detectron2 R50-FPN
(train_anatomy.py:562 `faster_rcnn_R_50_FPN_3x.yaml`): 7×7/2 stem +
3×3/2 maxpool, bottleneck stages [3,4,6,3] with stride-2 downsampling at
stage entry, FPN with 256-channel laterals over C2..C5 plus a stride-2
maxpool P6.

Norm choice: Detectron2 uses FrozenBN affines carried from ImageNet
pretraining. Pretrained weights can't be fetched in this environment, so
the default is GroupNorm(32) — the standard from-scratch-friendly,
batch-independent choice that runs well on TPU; 'frozen_bn' (pure
scale/bias) is available for loading converted torch checkpoints via
ekaid_tpu.tools.torch_convert.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ekaid_tpu.utils.dtypes import Policy, F32


class FrozenAffine(nn.Module):
    """FrozenBatchNorm equivalent: y = x * scale + bias (no statistics)."""

    features: int
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x * self.policy.cast_compute(scale)
                + self.policy.cast_compute(bias))


def make_norm(kind: str, features: int, policy: Policy, name: str):
    if kind == "gn":
        return nn.GroupNorm(num_groups=32, name=name,
                            dtype=policy.compute_dtype)
    if kind == "frozen_bn":
        return FrozenAffine(features, policy=policy, name=name)
    raise ValueError(f"unknown norm {kind!r}")


class Bottleneck(nn.Module):
    out_channels: int           # block output (4x the bottleneck width)
    stride: int = 1
    norm: str = "gn"
    stride_in_1x1: bool = False  # Detectron2 caffe-R50 places the stride
    policy: Policy = F32         # on conv1 (RESNETS.STRIDE_IN_1X1=True);
                                 # required when loading converted
                                 # reference checkpoints (torch_convert)

    @nn.compact
    def __call__(self, x):
        width = self.out_channels // 4
        dt = self.policy.compute_dtype
        s1, s2 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = nn.Conv(self.out_channels, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=dt, name="conv_sc")(x)
            shortcut = make_norm(self.norm, self.out_channels, self.policy,
                                 "norm_sc")(shortcut)
        y = nn.Conv(width, (1, 1), strides=s1, use_bias=False, dtype=dt,
                    name="conv1")(x)
        y = nn.relu(make_norm(self.norm, width, self.policy, "norm1")(y))
        y = nn.Conv(width, (3, 3), strides=s2, padding=1,
                    use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.relu(make_norm(self.norm, width, self.policy, "norm2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=dt,
                    name="conv3")(y)
        y = make_norm(self.norm, self.out_channels, self.policy,
                      "norm3")(y)
        return nn.relu(y + shortcut)


class SpaceToDepthStem(nn.Module):
    """The 7×7/s2 stem conv computed as an algebraically-identical
    4×4/s1 conv on a 2×2 space-to-depth input — the classic TPU stem
    rewrite (MLPerf ResNet): C_in=3 leaves the MXU's contraction lanes
    ~98% idle; s2d quadruples the depth (3→12) and quarters the spatial
    extent, with bit-compatible semantics.

    Derivation: out[i,j] = Σ_{ky,kx,c} w[ky,kx,c] x[2i+ky−3, 2j+kx−3, c]
    (pad 3). Substituting 2i+ky−3 = 2(i+ku−2) + dy with ky = 2ku+dy−1,
    ku∈[0,4), dy∈{0,1} maps every tap once (ku=0,dy=0 ⇒ ky=−1 is a zero
    weight), giving a 4×4 stride-1 conv over the s2d grid with
    asymmetric padding (2,1). The parameter keeps the reference
    [7,7,C,64] layout — checkpoints and the Detectron2 converter are
    unaffected by the knob."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w_, c = x.shape
        assert h % 2 == 0 and w_ % 2 == 0, "s2d stem needs even H, W"
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, c, self.features))
        # kernel transform: [7,7,C,O] -> [4,4,2,2,C,O] -> [4,4,4C,O]
        w2 = jnp.zeros((4, 4, 2, 2, c, self.features), w.dtype)
        for ku in range(4):
            for dy in range(2):
                ky = 2 * ku + dy - 1
                if not 0 <= ky < 7:
                    continue
                for kv in range(4):
                    for dx in range(2):
                        kx = 2 * kv + dx - 1
                        if 0 <= kx < 7:
                            w2 = w2.at[ku, kv, dy, dx].set(w[ky, kx])
        w2 = w2.reshape(4, 4, 4 * c, self.features)
        # space-to-depth: [B,H,W,C] -> [B,H/2,W/2,4C], channel index
        # dy·2C + dx·C + c (must match the kernel reshape above)
        x2 = x.reshape(b, h // 2, 2, w_ // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 2, w_ // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype), w2.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    depths: Sequence[int] = (3, 4, 6, 3)       # ResNet-50
    channels: Sequence[int] = (256, 512, 1024, 2048)
    norm: str = "gn"
    stride_in_1x1: bool = False
    s2d_stem: bool = False
    policy: Policy = F32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        dt = self.policy.compute_dtype
        x = self.policy.cast_compute(x)
        if self.s2d_stem:
            x = SpaceToDepthStem(64, dtype=dt, name="stem_conv")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=dt, name="stem_conv")(x)
        x = nn.relu(make_norm(self.norm, 64, self.policy, "stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = {}
        for stage, (depth, ch) in enumerate(zip(self.depths,
                                                self.channels)):
            for block in range(depth):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = Bottleneck(ch, stride=stride, norm=self.norm,
                               stride_in_1x1=self.stride_in_1x1,
                               policy=self.policy,
                               name=f"c{stage + 2}_b{block}")(x)
            feats[f"c{stage + 2}"] = x
        return feats


class ResNetFPN(nn.Module):
    """ResNet + FPN; returns {p2..p6} with `out_channels` channels."""

    out_channels: int = 256
    norm: str = "gn"
    stride_in_1x1: bool = False
    s2d_stem: bool = False
    policy: Policy = F32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        dt = self.policy.compute_dtype
        c = ResNet(norm=self.norm, stride_in_1x1=self.stride_in_1x1,
                   s2d_stem=self.s2d_stem,
                   policy=self.policy, name="resnet")(x)
        laterals = {}
        for lvl in (2, 3, 4, 5):
            laterals[lvl] = nn.Conv(self.out_channels, (1, 1), dtype=dt,
                                    name=f"lateral{lvl}")(c[f"c{lvl}"])
        # top-down pathway: nearest-neighbor 2x upsample + add
        merged = {5: laterals[5]}
        for lvl in (4, 3, 2):
            up = merged[lvl + 1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            up = up[:, :laterals[lvl].shape[1], :laterals[lvl].shape[2]]
            merged[lvl] = laterals[lvl] + up
        out = {}
        for lvl in (2, 3, 4, 5):
            out[f"p{lvl}"] = nn.Conv(self.out_channels, (3, 3), padding=1,
                                     dtype=dt,
                                     name=f"out{lvl}")(merged[lvl])
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out
