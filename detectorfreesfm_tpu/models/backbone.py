"""ResNet-FPN backbones (Flax linen, NHWC).

Topologically equivalent to the reference coarse matcher's ResNetFPN_8_2
(third_party/LoFTR/src/loftr/backbone/resnet_fpn.py:43 — BasicBlock ResNet
trunk at strides 2/4/8 + FPN top-down refinement back to 1/2), so pretrained
torch checkpoints can be converted 1:1 by utils/torch_port.py. Layout is
NHWC and all convs are bias-free + BatchNorm, which XLA fuses cleanly on TPU.

Outputs: coarse features (B, H/8, W/8, 256) and fine features (B, H/2, W/2, 128).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, s, name: nn.Conv(
            c, (3, 3), strides=(s, s), padding=1, use_bias=False,
            dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        y = conv(self.planes, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.planes, 1, "conv2")(y)
        y = bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="downsample_bn",
            )(x)
        return nn.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    """Coarse 1/8 (256-d) + fine 1/2 (128-d) feature pyramid."""

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, 1) grayscale in [0, 1]
        bd = self.block_dims
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype, name=name
        )
        x = nn.Conv(self.initial_dim, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        # Trunk
        x1 = BasicBlock(bd[0], 1, self.dtype, name="layer1_0")(x, train)
        x1 = BasicBlock(bd[0], 1, self.dtype, name="layer1_1")(x1, train)      # 1/2
        x2 = BasicBlock(bd[1], 2, self.dtype, name="layer2_0")(x1, train)
        x2 = BasicBlock(bd[1], 1, self.dtype, name="layer2_1")(x2, train)      # 1/4
        x3 = BasicBlock(bd[2], 2, self.dtype, name="layer3_0")(x2, train)
        x3 = BasicBlock(bd[2], 1, self.dtype, name="layer3_1")(x3, train)      # 1/8
        # FPN top-down
        c3 = nn.Conv(bd[2], (1, 1), use_bias=False, dtype=self.dtype,
                     name="layer3_out")(x3)                                     # coarse out
        y3 = _upsample2(c3)
        y2 = nn.Conv(bd[2], (1, 1), use_bias=False, dtype=self.dtype,
                     name="layer2_lateral")(x2)
        y2 = y2 + y3
        y2 = nn.Conv(bd[1], (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="layer2_smooth1")(y2)
        y2 = nn.relu(bn("layer2_smooth_bn")(y2))
        y2 = nn.Conv(bd[1], (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="layer2_smooth2")(y2)                                 # 1/4
        y1 = _upsample2(y2)
        x1l = nn.Conv(bd[1], (1, 1), use_bias=False, dtype=self.dtype,
                      name="layer1_lateral")(x1)
        y1 = x1l + y1
        y1 = nn.Conv(bd[1], (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="layer1_smooth1")(y1)
        y1 = nn.relu(bn("layer1_smooth_bn")(y1))
        fine = nn.Conv(bd[0], (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                       name="layer1_smooth2")(y1)                               # 1/2
        return c3, fine


def _upsample2(x):
    """Nearest 2x upsample, NHWC (TPU-cheap; FPN smoothing follows anyway)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ResNetFPN(nn.Module):
    """Generic ResNet-FPN covering the reference's remaining stride variants.

    The reference ships five near-identical classes — ResNetFPN_{8_2, 8_1,
    4_1, 2_1, 16_4} (src/MultiviewMatcher/backbone/resnet.py:85-520, its own
    "FIXME: REPEAT") — differing only in first-conv kernel/stride, trunk
    depth, and which pyramid levels are emitted. One parameterized module
    replaces them: `stage_strides` fixes the trunk, `fine_stage` fixes how
    far the top-down path descends. ResNetFPN_8_2 above is kept as a distinct
    class for checkpoint-name stability (it is the variant both pipelines
    load); `build_resnetfpn` maps every reference variant name.

    Returns (coarse, fine): coarse = deepest stage after a 1x1 out conv
    (block_dims[-1] channels, resolution = prod(strides)); fine = the FPN
    output at stage `fine_stage` (block_dims[fine_stage] channels).
    """

    stage_strides: Sequence[int] = (1, 2, 2)
    block_dims: Sequence[int] = (128, 196, 256)
    initial_dim: int = 128
    first_kernel: int = 7
    first_stride: int = 1
    fine_stage: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bd = list(self.block_dims)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name=name,
        )
        k, s = self.first_kernel, self.first_stride
        x = nn.Conv(self.initial_dim, (k, k), strides=(s, s), padding=k // 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        feats = []
        for i, (d, st) in enumerate(zip(bd, self.stage_strides)):
            x = BasicBlock(d, st, self.dtype, name=f"layer{i + 1}_0")(x, train)
            x = BasicBlock(d, 1, self.dtype, name=f"layer{i + 1}_1")(x, train)
            feats.append(x)

        coarse = nn.Conv(bd[-1], (1, 1), use_bias=False, dtype=self.dtype,
                         name=f"layer{len(bd)}_out")(feats[-1])
        # Top-down: lateral 1x1 raises stage i to the level-(i+1) width, the
        # two 3x3 smooths bring it back down to the stage-i width (the
        # reference's outconv/outconv2 channel flow).
        y = coarse
        for i in range(len(bd) - 2, self.fine_stage - 1, -1):
            y = _upsample2(y)
            lat = nn.Conv(bd[i + 1], (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"layer{i + 1}_lateral")(feats[i])
            y = lat + y
            y = nn.Conv(bd[i + 1], (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"layer{i + 1}_smooth1")(y)
            y = nn.relu(bn(f"layer{i + 1}_smooth_bn")(y))
            y = nn.Conv(bd[i], (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"layer{i + 1}_smooth2")(y)
        return coarse, y


# Reference variant table (name -> constructor kwargs). Resolutions are
# relative to the input: coarse at prod(first_stride, stage_strides), fine at
# the `fine_stage` level. Defaults mirror the reference training configs'
# channel ladders; all are overridable at build time.
_FPN_VARIANTS = {
    # conv1 7x7/s1, 4 stages -> coarse 1/8, fine 1/1
    "8_1": dict(first_kernel=7, first_stride=1, stage_strides=(1, 2, 2, 2),
                block_dims=(64, 96, 128, 196), initial_dim=64, fine_stage=0),
    # conv1 7x7/s1, 3 stages -> coarse 1/4, fine 1/1
    "4_1": dict(first_kernel=7, first_stride=1, stage_strides=(1, 2, 2),
                block_dims=(64, 96, 128), initial_dim=64, fine_stage=0),
    # conv1 3x3/s1, 2 stages -> coarse 1/2, fine 1/1
    "2_1": dict(first_kernel=3, first_stride=1, stage_strides=(1, 2),
                block_dims=(64, 96), initial_dim=64, fine_stage=0),
    # conv1 7x7/s2, 4 stages -> coarse 1/16, fine 1/4
    "16_4": dict(first_kernel=7, first_stride=2, stage_strides=(1, 2, 2, 2),
                 block_dims=(128, 196, 256, 384), initial_dim=128,
                 fine_stage=1),
}


def build_resnetfpn(variant: str, dtype: jnp.dtype = jnp.float32, **overrides):
    """Build any reference ResNetFPN variant by name ('8_2', '8_1', '4_1',
    '2_1', '16_4'); replaces src/MultiviewMatcher/backbone/__init__.py:8."""
    if variant == "8_2":
        return ResNetFPN_8_2(dtype=dtype, **overrides)
    if variant not in _FPN_VARIANTS:
        raise ValueError(f"unknown ResNetFPN variant {variant!r}; "
                         f"choose from ['8_2', {sorted(_FPN_VARIANTS)}]")
    kw = dict(_FPN_VARIANTS[variant])
    kw.update(overrides)
    return ResNetFPN(dtype=dtype, **kw)
