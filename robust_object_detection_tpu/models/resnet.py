"""ResNet backbone (Flax, NHWC) for the Faster R-CNN family.

The reference uses torchvision's COCO-pretrained
`fasterrcnn_resnet50_fpn_v2` (train_frcnn_baseline.py:139-143); this is the
TPU-native ResNet-50 producing the C2..C5 feature pyramid. Bottleneck-v1
layout (1x1 reduce, 3x3, 1x1 expand; stride on the 3x3 like torchvision),
BatchNorm in float32, compute optionally bfloat16.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BottleneckBlock(nn.Module):
    features: int          # bottleneck width; output is 4x this
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=jnp.float32)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=jnp.float32)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                           scale_init=nn.initializers.zeros)(out)
        if residual.shape != out.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=jnp.float32)(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns (C2, C3, C4, C5) at strides 4/8/16/32."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)     # ResNet-50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = BottleneckBlock(width, stride, dtype=self.dtype)(x, train)
            feats.append(x)
        return tuple(feats)


def resnet50(dtype: Any = jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), dtype)
