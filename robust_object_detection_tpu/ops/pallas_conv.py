"""Planes-layout 3x3 stride-1 conv for small-channel stages (TPU Pallas).

WHY. HGNetv2's stage-1 block runs six 3x3 convs at 48 channels on
256x256 maps. In NHWC, XLA pads the 48-lane dimension to 128 (2.7x HBM
on every tensor) and the stage costs ~24 ms fwd+bwd of the RT-DETR step
(bs8/1024px, device-traced). In a PLANES layout (B, H, C, W) every
tensor is tile-compact — W in lanes, C in sublanes — and XLA handles all
the pointwise/BN/concat/1x1 work efficiently there; only the 3x3 conv
needs a kernel, because XLA convs don't understand the layout.

The kernel computes y^T (C_out, W) = k^T (C_out, 9 C_in) @ X^T per output
row, with X^T built from lane-rolls (edge-masked => SAME padding) and
sublane concats over a 3-row window (double-buffered halo DMA, same
machinery as ops/pallas_stem.py). The backward reuses the FORWARD kernel
for dX (conv with the spatially-flipped, transposed kernel) plus a
weight-grad kernel accumulating dk (9 C_in, C_out) across the grid.

Public entry: :func:`conv3x3_planes` (custom_vjp) on (B, H, C, W) inputs.
Requires W a lane multiple (128) and C a sublane multiple (8); H must be
a multiple of the row block R.

Reference counterpart: the stage-1 HGBlock convs of Ultralytics HGNetv2
(SURVEY.md §2.2 RT-DETR-L capability row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_stem import (R, _DBuf, _interpret, _roll_left_masked,
                          _roll_right_masked, _round8)


def _conv3x3_kernel(xp_hbm, kT_ref, o_ref, sc, sem, *, w, cin, cout,
                    dtype):
    """y rows [i0*R, i0*R+R) from +1-shifted x storage rows [i0*R, +R+2).
    Patch order (dy, dx, c): dx=0 -> right-rolled, dx=1 -> center,
    dx=2 -> left-rolled (x col j-1 / j / j+1)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(xp_hbm, sc, sem, R)], b, i0, pl.num_programs(1)).run()
    kT = kT_ref[...].astype(dtype)                       # (cout, 9cin)
    for r in range(R):
        tiles = []
        for dy in range(3):
            xr = sc[slot, r + dy].astype(dtype)          # (cin, W)
            tiles.append(_roll_right_masked(xr, w))
            tiles.append(xr)
            tiles.append(_roll_left_masked(xr, w))
        xT = jnp.concatenate(tiles, 0)                   # (9cin, W)
        y = jax.lax.dot_general(
            kT, xT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (cout, W)
        o_ref[r] = y.astype(o_ref.dtype)


def _conv3x3_wgrad_kernel(xp_hbm, dy_hbm, dk_ref, sx, sdy, sem_x, sem_d,
                          *, w, cin, cout, dtype):
    """dk (9cin, cout) += X^T @ dy^T per output row, grid-accumulated."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(xp_hbm, sx, sem_x, R), (dy_hbm, sdy, sem_d, R)],
                 b, i0, pl.num_programs(1)).run()
    acc = jnp.zeros((9 * cin, cout), jnp.float32)
    for r in range(R):
        tiles = []
        for dy in range(3):
            xr = sx[slot, r + dy].astype(dtype)
            tiles.append(_roll_right_masked(xr, w))
            tiles.append(xr)
            tiles.append(_roll_left_masked(xr, w))
        xT = jnp.concatenate(tiles, 0)                   # (9cin, W)
        dyr = sdy[slot, r].astype(dtype)                 # (cout, W)
        acc = acc + jax.lax.dot_general(
            xT, dyr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    first = jnp.logical_and(b == 0, i0 == 0)

    @pl.when(first)
    def _():
        dk_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        dk_ref[...] = dk_ref[...] + acc


def _shift_pad(x):
    """(B, H, C, W) -> (B, HP, C, W): storage row t = x row t-1, zero rows
    above/below (SAME vertical padding; horizontal comes from the masked
    rolls)."""
    b, h, c, w = x.shape
    hp = _round8(h + 2 + R)
    return jnp.pad(x, ((0, 0), (1, hp - h - 1), (0, 0), (0, 0)))


def _conv_call(x, k, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, cin, w = x.shape
    cout = k.shape[-1]
    nb = h // R
    xp = _shift_pad(x.astype(dtype))
    kT = k.reshape(9 * cin, cout).T
    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, w=w, cin=cin, cout=cout,
                          dtype=dtype),
        grid=(b, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((cout, 9 * cin), lambda bb, ii: (0, 0))],
        out_specs=pl.BlockSpec((None, R, cout, w),
                               lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, cout, w), dtype),
        scratch_shapes=[pltpu.VMEM((2, R + 8, cin, w), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(xp, kT)


def _wgrad_call(x, dy, cin, cout, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, _, w = x.shape
    nb = h // R
    xp = _shift_pad(x.astype(dtype))
    return pl.pallas_call(
        functools.partial(_conv3x3_wgrad_kernel, w=w, cin=cin, cout=cout,
                          dtype=dtype),
        grid=(b, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda bb, ii: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, R + 8, cin, w), dtype),
                        pltpu.VMEM((2, R, cout, w), dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(xp, dy.astype(dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_planes(x, k, dtype=jnp.bfloat16):
    """3x3 stride-1 SAME conv in planes layout.

    x: (B, H, C_in, W) — W mult of 128, C mult of 8, H mult of 8;
    k: (3, 3, C_in, C_out). Returns (B, H, C_out, W) in `dtype`."""
    return _conv_call(x, k, dtype)


def _fwd(x, k, dtype):
    return _conv_call(x, k, dtype), (x, k)


def _bwd(dtype, res, dy):
    x, k = res
    cin, cout = k.shape[2], k.shape[3]
    # dX = conv3x3(dY, k') with k'[a, b, co, ci] = k[2-a, 2-b, ci, co]
    kflip = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2)
    dx = _conv_call(dy, kflip, dtype).astype(x.dtype)
    dk = _wgrad_call(x, dy, cin, cout, dtype).reshape(3, 3, cin, cout)
    return dx, dk.astype(k.dtype)


conv3x3_planes.defvjp(_fwd, _bwd)


def supported(x_shape):
    b, h, c, w = x_shape
    return h % R == 0 and w % 128 == 0 and c % 8 == 0 and h >= 2 * R
