"""Residual restoration U-Net (Flax, NHWC).

Capability parity with the reference's 3.70M-param RestorationUNet
(restoration_net.py:17-106, docs/06_restoration_experiment.md:26):

  * 4 encoder stages (32, 64, 128, 256), each 2x(3x3 conv -> BN -> LeakyReLU
    0.2) followed by 2x max-pool; bottleneck ConvBlock at 256,
  * 4 decoder stages: 2x2 stride-2 transposed conv (channel-preserving),
    concat skip, ConvBlock down to the stage width,
  * 1x1 conv to a 3-channel residual; output = clamp(x + residual, 0, 1).

TPU-native choices: NHWC layout (XLA:TPU's native conv layout), optional
bfloat16 compute with float32 BatchNorm statistics, and a `remat` flag that
rematerialises encoder stages to trade FLOPs for HBM on large inputs.
Inputs must have H, W divisible by 16 (4 pools) — the inference path pads
reflectively to a multiple of 16 exactly like the reference
(restore_testsets.py:52-61) via :func:`restore_tiled`.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32)(x)
            x = nn.leaky_relu(x, 0.2)
        return x


class RestorationUNet(nn.Module):
    channels: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (N, H, W, 3) float in [0, 1], H % 16 == W % 16 == 0."""
        block = ConvBlock
        if self.remat:
            block = nn.remat(ConvBlock, static_argnums=(2,))
        inp = x
        x = x.astype(self.dtype)

        skips = []
        for c in self.channels:
            x = block(c, self.dtype)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = block(self.channels[-1], self.dtype)(x, train)

        # Decoder stage widths: (128, 64, 32, 32) for the default channels —
        # the last stage keeps c1 (restoration_net.py:80-83).
        out_ch = list(self.channels[-2::-1]) + [self.channels[0]]
        for skip, c in zip(reversed(skips), out_ch):
            x = nn.ConvTranspose(x.shape[-1], (2, 2), strides=(2, 2),
                                 dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = block(c, self.dtype)(x, train)

        residual = nn.Conv(3, (1, 1), dtype=self.dtype)(x)
        return jnp.clip(inp + residual.astype(jnp.float32), 0.0, 1.0)


def create(channels: Sequence[int] = (32, 64, 128, 256),
           dtype: Any = jnp.float32, remat: bool = False) -> RestorationUNet:
    return RestorationUNet(channels=tuple(channels), dtype=dtype, remat=remat)


def init_variables(model: RestorationUNet, key: jax.Array,
                   patch: int = 256) -> dict:
    # jit the init: eager op-by-op dispatch compiles every conv separately
    # (~60s on CPU); one traced compile is ~4s and free on reuse.
    init = jax.jit(lambda k, x: model.init(k, x, train=False))
    return init(key, jnp.zeros((1, patch, patch, 3), jnp.float32))


def abstract_variables(model: RestorationUNet, patch: int = 256) -> dict:
    """Shape/dtype skeleton of the variable tree — no device work at all.

    For checkpoint-restore targets: `init_variables` compiles and RUNS the
    init on the accelerator just to learn shapes (several seconds through
    the axon tunnel); `jax.eval_shape` derives the identical tree for free.
    """
    return jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, patch, patch, 3), jnp.float32),
                           train=False))


# Process-level cache of the jitted inference applies, keyed by the model
# hyperparameters. Without it every restore_testsets/eval call builds a NEW
# jit wrapper and XLA recompiles the full U-Net (~11 s on v5e through the
# tunnel) even though an identical executable was just built — the r3 sweep
# decomposition showed the "warmed-up" timed run paying a fresh compile on
# its first Test_Noise batch.
_APPLY_CACHE: dict = {}


def _cache_key(kind: str, model: RestorationUNet):
    return (kind, type(model), tuple(model.channels), model.dtype,
            model.remat)


def jit_apply(model: RestorationUNet):
    """Shape-cached jitted inference apply: fn(variables, x) -> restored."""
    key = _cache_key("f32", model)
    if key not in _APPLY_CACHE:
        _APPLY_CACHE[key] = jax.jit(
            lambda v, x: model.apply(v, x, train=False))
    return _APPLY_CACHE[key]


def jit_apply_u8(model: RestorationUNet):
    """uint8-in/uint8-out jitted inference apply.

    The u8->f32/255 normalisation and the f32->u8 re-quantisation
    (clip(y*255+0.5, 0, 255) then truncate — restore_testsets.py:74-77's
    np.clip(...).astype(np.uint8), floor == truncate for non-negatives)
    run ON DEVICE, so host<->device traffic is uint8: 4x less than
    shipping f32 each way. Output matches the host-side path within
    +-1 LSB: fusing the scale ops into the model executable can shift
    y by 1 ulp, which flips a byte when y*255+0.5 sits exactly on an
    integer boundary (measured 1/55296 bytes on v5e).
    """
    key = _cache_key("u8", model)
    if key not in _APPLY_CACHE:
        def f(v, x_u8):
            y = model.apply(v, x_u8.astype(jnp.float32) / 255.0,
                            train=False)
            return jnp.floor(jnp.clip(y * 255.0 + 0.5, 0.0, 255.0)
                             ).astype(jnp.uint8)
        _APPLY_CACHE[key] = jax.jit(f)
    return _APPLY_CACHE[key]


def param_count(variables: dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(variables["params"]))


def pad_to_16(img: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
    """Reflect-pad H,W to multiples of 16 (restore_testsets.py:52-61 uses
    BORDER_REFLECT); returns (padded, (orig_h, orig_w))."""
    h, w = img.shape[-3], img.shape[-2]
    ph, pw = (-h) % 16, (-w) % 16
    if ph or pw:
        spatial = img.ndim - 3
        pads = [(0, 0)] * spatial + [(0, ph), (0, pw), (0, 0)]
        img = jnp.pad(img, pads, mode="reflect")
    return img, (h, w)


def restore_image(apply_fn, variables: dict, img: jax.Array) -> jax.Array:
    """Full-resolution restoration of one HWC [0,1] image: pad to 16,
    forward, un-pad (the reference's restore_image, restore_testsets.py:52-79).

    `apply_fn` should be a jitted fn(variables, x) (see :func:`jit_apply`);
    each distinct padded shape compiles once and is cached.
    """
    x, (h, w) = pad_to_16(img[None])
    out = apply_fn(variables, x)
    return out[0, :h, :w]
