"""S2DNet-style VGG hypercolumn backbone for the multiview refiner.

Behavioral contract from the reference's refinement backbone
(src/MultiviewMatcher/backbone/S2DNet/s2dnet.py:55-205 + vggnet.py): a VGG16
prefix producing conv1_2 (stride 1, 64-d) and conv3_3 (stride 4, 256-d)
hypercolumn maps, each adapted to 128-d by a 1x1 -> 5x5 conv pair, upsampled
to full resolution and summed. Pooling uses stride-2 3x3 windows (the
reference's substitute_pooling_layers) so patch parity is preserved.

TPU-first: runs on dense batches of fixed-size patches (T*V, P, P, 1) — the
refiner's sparse path — so every conv is one big NHWC batch on the MXU;
bilinear upsample instead of the reference's bicubic (sub-0.1% feature delta,
far cheaper on TPU).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_resize(x: jax.Array, hw) -> jax.Array:
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="bilinear"
    )


class S2DNet(nn.Module):
    """Patch hypercolumn features: (N, P, P, 1) -> (N, P, P, out_dim)."""

    out_dim: int = 128
    vgg_dims1: Sequence[int] = (64, 64)            # conv1_1, conv1_2
    vgg_dims2: Sequence[int] = (128, 128)          # conv2_*
    vgg_dims3: Sequence[int] = (256, 256, 256)     # conv3_*
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding=k // 2, dtype=self.dtype, name=name
        )
        h, w = x.shape[1:3]
        # Block 1 (stride 1)
        y = nn.relu(conv(self.vgg_dims1[0], 3, "conv1_1")(x))
        y = nn.relu(conv(self.vgg_dims1[1], 3, "conv1_2")(y))
        hyper1 = y  # (N, P, P, 64)
        # 3x3 stride-2 max pool (substitute_pooling_layers)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        # Block 2
        y = nn.relu(conv(self.vgg_dims2[0], 3, "conv2_1")(y))
        y = nn.relu(conv(self.vgg_dims2[1], 3, "conv2_2")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        # Block 3
        y = nn.relu(conv(self.vgg_dims3[0], 3, "conv3_1")(y))
        y = nn.relu(conv(self.vgg_dims3[1], 3, "conv3_2")(y))
        y = nn.relu(conv(self.vgg_dims3[2], 3, "conv3_3")(y))
        hyper3 = y  # (N, ceil(P/4), ceil(P/4), 256)

        # Adaptation: 1x1 -> gelu -> 5x5 to out_dim (reference AdapLayers
        # uses relu; gelu's non-dead negative branch helps from-scratch
        # training escape feature collapse)
        def adapt(f, name):
            f = nn.gelu(conv(self.out_dim, 1, f"{name}_1x1")(f))
            return conv(self.out_dim, 5, f"{name}_5x5")(f)

        a1 = adapt(hyper1, "adap1")
        a3 = _bilinear_resize(adapt(hyper3, "adap3"), (h, w))
        return a1 + a3
