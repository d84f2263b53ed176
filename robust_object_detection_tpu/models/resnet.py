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
    """Returns (C2, C3, C4, C5) at strides 4/8/16/32.

    trainable_layers follows torchvision's ``trainable_backbone_layers``
    (0..5, counted from the top: 5 = everything trains; 3 — the value
    torchvision picks whenever weights are given, so the reference's
    ``weights="DEFAULT"`` build, train_frcnn_baseline.py:139 — freezes
    conv1/bn1/layer1). Frozen regions sit behind ``stop_gradient``: their
    params get exactly-zero grads AND XLA drops their backward convs
    entirely (the stride-4 stem/layer1 backward is the most expensive
    region at 1024px). BatchNorm running stats still update in frozen
    layers — torch ``model.train()`` does the same (requires_grad only
    gates the affine params).
    """
    stage_sizes: Sequence[int] = (3, 4, 6, 3)     # ResNet-50
    dtype: Any = jnp.float32
    trainable_layers: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.trainable_layers < 5:             # conv1/bn1 frozen
            x = jax.lax.stop_gradient(x)
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = BottleneckBlock(width, stride, dtype=self.dtype)(x, train)
            if i < 4 - self.trainable_layers:     # layer{i+1} frozen
                x = jax.lax.stop_gradient(x)
            feats.append(x)
        return tuple(feats)


def frozen_param_labels(stage_sizes: Sequence[int], trainable_layers: int):
    """Backbone param-collection names frozen at this trainable_layers.

    Flax ``nn.compact`` auto-names: stem = Conv_0/BatchNorm_0, blocks =
    BottleneckBlock_k numbered consecutively across stages. Used to mask
    weight decay off frozen params (the reference optimises only
    requires_grad params, train_frcnn_baseline.py:149)."""
    if trainable_layers >= 5:
        return set()
    names = {"Conv_0", "BatchNorm_0"}
    n_frozen_stages = max(0, 4 - trainable_layers)
    for k in range(sum(stage_sizes[:n_frozen_stages])):
        names.add(f"BottleneckBlock_{k}")
    return names


def resnet50(dtype: Any = jnp.float32) -> ResNet:
    return ResNet((3, 4, 6, 3), dtype)
