"""Fused Pallas corruption kernel: per-image noise/blur/lowres in ONE pass.

The XLA path (ops/corrupt.py random_corruption) materialises all four
variants for the whole batch and gathers one per image — ~6 full HBM passes
over the batch. This kernel computes ONLY the chosen corruption per image,
fused, in a single read+write pass:

  * grid (batch, H-tiles); the per-image corruption id and RNG seed arrive
    via scalar prefetch, so each tile executes just its image's branch
    under `@pl.when`,
  * the input is reflect-101 pre-padded by XLA (2 rows / 4 pixel columns),
    making every tap in-bounds — the kernel reads a (TILE_H + 4)-row window
    with a manual HBM->VMEM DMA and writes the interior tile,
  * channels stay interleaved: the image is viewed as (H, W*C) so the lane
    dimension is W*C (3072 for 1024x3 — fully tiled); a horizontal
    one-pixel tap is a lane roll by C,
  * noise: on-core PRNG (pltpu.prng_random_bits) -> Box-Muller gaussian,
    sigma=15, clip+truncate like np.clip(...).astype(uint8)
    (augmentations.py:30-33),
  * blur: at the reference's BLUR_ANGLE_DEG=0 (augmentations.py:14-17) the
    k x k motion kernel is a pure horizontal k-tap mean — k lane-rolls,
    round-half-even quantise,
  * lowres 0.5x: 2x2 box mean + half-pixel bilinear 2x upsample composed as
    one local FIR (fast path: no intermediate uint8 rounding; border pixels
    see reflect-101 instead of cv2's coefficient clamp).

Training-path semantics (`fast` distributional parity); the frozen-testset
builder keeps the bit-exact XLA/OpenCV path. Falls back to ops/corrupt.py
off-TPU or for angle != 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CorruptionConfig
from . import corrupt as corrupt_ops

# 64 rows/tile keeps the blur branch's 9 unrolled roll temps inside the
# scoped VMEM budget at W=1024 (128-row tiles hit the 16M stack limit)
TILE_H = 64
# rows each side; lowres needs 2, but the DMA window (TILE_H + 2*HALO) must
# be 8-aligned for TPU sublane tiling -> 4
HALO = 4
WPAD = 4          # pixel columns each side (blur k=9 -> 4; lowres -> 2)


def _kernel(choice_ref, seed_ref, in_hbm, out_ref, scratch, sems,
            *, sigma: float, blur_k: int, c: int, w: int, quantize: bool):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def roll(v, shift, axis):
        # pltpu.roll requires non-negative shifts; negative = size - shift
        return pltpu.roll(v, shift % v.shape[axis], axis)

    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_t

    # Double-buffered halo DMA: grid steps run sequentially on the core, so
    # step s waits on the window started at step s-1 and prefetches step
    # s+1's window into the other slot (guide: Patterns/Double Buffering).
    step = b * n_t + t

    def window_dma(s, slot):
        bs = s // n_t
        ts = s % n_t
        return pltpu.make_async_copy(
            in_hbm.at[bs, pl.ds(ts * TILE_H, TILE_H + 2 * HALO)],
            scratch.at[slot], sems.at[slot])

    slot = step % 2

    @pl.when(step == 0)
    def _():
        window_dma(step, slot).start()

    @pl.when(step + 1 < n_total)
    def _():
        window_dma(step + 1, (step + 1) % 2).start()

    window_dma(step, slot).wait()

    choice = choice_ref[b]
    x = scratch[slot]                                 # (TILE_H+2H, wc)
    core = x[HALO:HALO + TILE_H, :]

    interior = slice(WPAD * c, WPAD * c + w * c)

    @pl.when(choice == corrupt_ops.CLEAN)
    def _():
        out_ref[0] = core[:, interior]

    @pl.when(choice == corrupt_ops.NOISE)
    def _():
        pltpu.prng_seed(seed_ref[b] + t)
        bits = pltpu.prng_random_bits((TILE_H, w * c))
        # Mosaic cannot cast uint32->float32; route through int32 (the
        # 16-bit masks keep the values non-negative)
        i32 = pltpu.bitcast(bits, jnp.int32)
        # two uniforms from one draw: low/high 16 bits -> (0, 1]
        u1 = ((i32 & 0xFFFF).astype(jnp.float32) + 0.5) / 65536.0
        u2 = (((i32 >> 16) & 0xFFFF).astype(jnp.float32) + 0.5) / 65536.0
        gauss = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
            2.0 * np.pi * u2)
        y = core[:, interior] + sigma * gauss
        if quantize:
            y = jnp.floor(jnp.clip(y, 0.0, 255.0))
        out_ref[0] = y

    @pl.when(choice == corrupt_ops.BLUR)
    def _():
        # horizontal k-tap mean: lane rolls by +-i pixels (i*c lanes)
        acc = jnp.zeros_like(core)
        for i in range(-(blur_k // 2), blur_k // 2 + 1):
            acc = acc + roll(core, -i * c, 1)
        y = acc[:, interior] * (1.0 / blur_k)
        if quantize:
            y = jnp.clip(jnp.rint(y), 0.0, 255.0)
        out_ref[0] = y

    @pl.when(choice == corrupt_ops.LOWRES)
    def _():
        # down: 2x2 box mean at even alignment; up: half-pixel bilinear.
        # Composed per output pixel via lane/row rolls. s(y, x) denotes the
        # half-res image; up[2i]   = 0.75 s[i] + 0.25 s[i-1] per axis.
        def down_up_1d(v, axis, stride):
            # v padded; returns same-size upsampled-downsampled along axis
            # s at coord j uses v[2j], v[2j+1]
            sA = (v + roll(v, -stride, axis)) * 0.5   # pair mean at 2j
            # up[2i] needs s[i] (at lane 2i) and s[i-1] (at lane 2i-2)
            s_here = sA                                      # aligned at 2j
            s_prev = roll(sA, 2 * stride, axis)
            s_next = roll(sA, -2 * stride, axis)
            even = 0.75 * s_here + 0.25 * s_prev             # at even coords
            odd = 0.75 * s_here + 0.25 * s_next              # at odd coords
            idx = jax.lax.broadcasted_iota(
                jnp.int32, v.shape, axis) // stride
            is_even = (idx % 2) == 0
            # value at even coord 2i lives at position 2i (s aligned there);
            # at odd coord 2i+1 the source s[i] also sits at 2i -> roll by 1
            even_v = even
            odd_v = roll(odd, stride, axis)
            return jnp.where(is_even, even_v, odd_v)

        y = down_up_1d(x, 1, c)          # horizontal (uses WPAD halo)
        y = down_up_1d(y, 0, 1)          # vertical (uses row halo)
        y = y[HALO:HALO + TILE_H, interior]
        if quantize:
            y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
        out_ref[0] = y


@functools.partial(jax.jit, static_argnames=("cfg", "quantize", "interpret"))
def fused_random_corruption(img: jax.Array, key: jax.Array,
                            cfg: CorruptionConfig = CorruptionConfig(),
                            quantize: bool = True,
                            interpret: bool = False):
    """Drop-in for ops.corrupt.random_corruption (fast path) as one fused
    Pallas pass. img: (B, H, W, C) float32 [0,255]; H % TILE_H == 0, W even.

    Returns (corrupted (B, H, W, C) float32, choice (B,)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, w, c = img.shape
    if h % TILE_H or w % 2:
        raise ValueError(f"fused corruption needs H%{TILE_H}==0 and even W,"
                         f" got {h}x{w}")
    if cfg.blur_angle_deg % 360 != 0:
        raise NotImplementedError("fused kernel supports angle=0; use "
                                  "ops.corrupt.random_corruption")

    k_apply, k_choice, k_seed = jax.random.split(key, 3)
    apply_mask = jax.random.uniform(k_apply, (bsz,)) < cfg.prob
    choice3 = jax.random.randint(k_choice, (bsz,), corrupt_ops.NOISE,
                                 corrupt_ops.LOWRES + 1)
    choice = jnp.where(apply_mask, choice3, corrupt_ops.CLEAN).astype(
        jnp.int32)
    seeds = jax.random.randint(k_seed, (bsz,), 0, 2 ** 30, jnp.int32)

    x = img.astype(jnp.float32)
    # reflect-101 pre-pad (rows/pixel columns), flatten channels into lanes,
    # then zero-pad lanes to a multiple of 128 (TPU slice alignment; the
    # zero region sits beyond every tap's reach)
    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (WPAD, WPAD), (0, 0)),
                 mode="reflect")
    xp = xp.reshape(bsz, h + 2 * HALO, (w + 2 * WPAD) * c)
    wc_pad = -(-xp.shape[-1] // 128) * 128
    if wc_pad != xp.shape[-1]:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wc_pad - xp.shape[-1])))

    kernel = functools.partial(_kernel, sigma=cfg.noise_sigma,
                               blur_k=cfg.blur_kernel, c=c, w=w,
                               quantize=quantize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, h // TILE_H),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, w * c),
            lambda b, t, *pref: (b, t, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TILE_H + 2 * HALO, wc_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        # the TPU interpreter (not the generic one) understands prng_seed,
        # so CPU tests exercise the real kernel semantics
        interpret=pltpu.InterpretParams() if interpret else False,
    )(choice, seeds, xp)
    return out.reshape(bsz, h, w, c), choice
