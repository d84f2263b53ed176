"""Deformable-attention bilinear sampling with a TPU-native backward.

The forward is one fused 4-tap gather (take_along_axis). Its autodiff
transpose is a scatter-add into the value maps, which XLA serialises — in
round-1 profiling it accounted for ~365 ms of a 577 ms RT-DETR train step
(3 levels x 6 decoder layers of gathers; STATUS.md round-1 notes). This
module replaces that transpose with a custom VJP:

  * dV ("stamp scatter"): per (batch, head) the tap gradients are scattered
    by an MXU matmul against ONE-HOT TILES BUILT IN VMEM — for each
    (HW tile, tap chunk) the Pallas kernel materialises
    ``onehot[t, c] = (idx[t] == col(c))`` in bf16 and accumulates
    ``dv_tile^T (dh, C) += gw_chunk^T (dh, Tc) @ onehot (Tc, C)`` into the
    revisited output block. Sparse scatter becomes dense MXU work —
    wasteful in FLOPs, ~10x cheaper in wall-clock than XLA's serialised
    scatter on TPU.
  * d(sx, sy): re-gather the 4 tap values (cheap, forward-shaped) and dot
    with the analytic bilinear-weight derivatives.

Reference counterpart: the CUDA ``ms_deform_attn_backward`` kernel family
that Ultralytics/Deformable-DETR rely on (SURVEY.md §2.2 RT-DETR row).
Layouts are chosen for TPU tiling: every Pallas block keeps a
128-multiple minor dimension (dh=32 lives in the sublane dim).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _tap_geometry(sx, sy, h, w):
    """Shared forward/backward tap math.

    Returns (idx_hw, weights, dwdx, dwdy): each a list of 4 arrays shaped
    like sx — flat cell index (y*w+x, clipped), bilinear weight (0 outside)
    and its derivatives wrt sx/sy (0 outside)."""
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    one = jnp.ones_like(fx)
    taps = (
        (x0, y0, (1 - fx) * (1 - fy), -(1 - fy) * one, -(1 - fx) * one),
        (x0 + 1, y0, fx * (1 - fy), (1 - fy) * one, -fx * one),
        (x0, y0 + 1, (1 - fx) * fy, -fy * one, (1 - fx) * one),
        (x0 + 1, y0 + 1, fx * fy, fy * one, fx * one),
    )
    idxs, wgts, dxs, dys = [], [], [], []
    for xi, yi, wgt, dwx, dwy in taps:
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idxs.append(yi_c * w + xi_c)
        wgts.append(jnp.where(inside, wgt, 0.0))
        dxs.append(jnp.where(inside, dwx, 0.0))
        dys.append(jnp.where(inside, dwy, 0.0))
    return idxs, wgts, dxs, dys


def _gather_taps(v, idxs, n_h):
    """v: (B, H, W, heads, dh); idxs: 4 x (B, Q, heads, P) flat HW indices.
    Returns (B, Q, heads, P, 4, dh)."""
    b, h, w, _, dh = v.shape
    flat = v.reshape(b, h * w * n_h, dh)
    head_ids = jax.lax.broadcasted_iota(jnp.int32, idxs[0].shape, 2)
    idx = jnp.stack([i * n_h + head_ids for i in idxs], -1)
    return jnp.take_along_axis(
        flat, idx.reshape(b, -1, 1), axis=1
    ).reshape(b, *idx.shape[1:], dh)


@jax.custom_vjp
def bilinear_sample(v, sx, sy):
    """v: (B, H, W, heads, dh); sx/sy: (B, Q, heads, P) pixel coords.
    Returns (B, Q, heads, P, dh), zero outside the map."""
    return _forward(v, sx, sy)


def _forward(v, sx, sy):
    b, h, w, n_h, dh = v.shape
    idxs, wgts, _, _ = _tap_geometry(sx, sy, h, w)
    g = _gather_taps(v, idxs, n_h)                   # (B,Q,H,P,4,dh)
    wgt = jnp.stack(wgts, -1)                        # (B,Q,H,P,4)
    return (g * wgt[..., None]).sum(-2)


def _fwd_rule(v, sx, sy):
    return _forward(v, sx, sy), (v, sx, sy)


def _bwd_rule(res, g):
    v, sx, sy = res
    b, h, w, n_h, dh = v.shape
    idxs, wgts, dxs, dys = _tap_geometry(sx, sy, h, w)
    taps = _gather_taps(v, idxs, n_h)                # (B,Q,H,P,4,dh)
    gd = (g[..., None, :] * taps).sum(-1)            # (B,Q,H,P,4)
    dsx = sum(gd[..., t] * dxs[t] for t in range(4))
    dsy = sum(gd[..., t] * dys[t] for t in range(4))

    # dV: premultiply grads by tap weights, then stamp-scatter per head
    wgt = jnp.stack(wgts, -1)                        # (B,Q,H,P,4)
    gw = g[..., None, :] * wgt[..., None]            # (B,Q,H,P,4,dh)
    idx = jnp.stack(idxs, -1)                        # (B,Q,H,P,4)
    # (B, heads, T) / (B, heads, dh, T) with T = Q*P*4
    idx_t = idx.transpose(0, 2, 1, 3, 4).reshape(b, n_h, -1)
    gw_t = gw.transpose(0, 2, 5, 1, 3, 4).reshape(b, n_h, dh, -1)
    dv_flat = _stamp_scatter(idx_t, gw_t, h * w)     # (B, heads, dh, HW)
    dv = dv_flat.transpose(0, 3, 1, 2).reshape(b, h, w, n_h, dh)
    return dv.astype(v.dtype), dsx.astype(sx.dtype), dsy.astype(sy.dtype)


bilinear_sample.defvjp(_fwd_rule, _bwd_rule)


# ── stamp scatter ────────────────────────────────────────────────────────

def _stamp_scatter(idx, gw, hw: int,
                   tile_c: int = 2048, tile_t: int = 512) -> jax.Array:
    """idx: (B, heads, T) int32 flat cell ids; gw: (B, heads, dh, T) f32.
    Returns dv (B, heads, dh, HW) f32 with dv[b,h,:,c] = sum over taps t
    with idx==c of gw[b,h,:,t].
    """
    b, n_h, dh, t = gw.shape
    if jax.default_backend() != "tpu" or hw < tile_c:
        # XLA fallback (CPU tests / tiny maps): dense one-hot einsum
        onehot = (idx[..., None] ==
                  jnp.arange(hw, dtype=jnp.int32)).astype(gw.dtype)
        return jnp.einsum("bhdt,bhtc->bhdc", gw, onehot)
    return _stamp_scatter_pallas(idx, gw, hw, tile_c, tile_t)


@functools.partial(jax.jit, static_argnames=("hw", "tile_c", "tile_t"))
def _stamp_scatter_pallas(idx, gw, hw: int, tile_c: int, tile_t: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_h, dh, t = gw.shape
    tile_c = min(tile_c, -(-hw // 128) * 128)
    # Sort taps by destination cell so each chunk touches a narrow HW
    # range; the kernel then skips (tile, chunk) pairs outside the chunk's
    # [lo, hi] tile bounds. Deformable taps cluster around the reference
    # boxes, so this cuts the dense stamp work by roughly n_c/"few".
    order = jnp.argsort(idx, axis=-1)
    idx = jnp.take_along_axis(idx, order, -1)
    gw = jnp.take_along_axis(gw, order[:, :, None, :], -1)

    t_pad = -(-t // tile_t) * tile_t
    hw_pad = -(-hw // tile_c) * tile_c
    if t_pad != t:
        # pad by repeating the last (largest) sorted cell id with zero
        # gradient: chunk bounds stay tight and the match contributes 0
        idx = jnp.concatenate(
            [idx, jnp.repeat(idx[..., -1:], t_pad - t, -1)], -1)
        gw = jnp.pad(gw, ((0, 0), (0, 0), (0, 0), (0, t_pad - t)))
    n_c = hw_pad // tile_c
    n_k = t_pad // tile_t
    chunks = idx.reshape(b, n_h, n_k, tile_t)
    lo = (chunks.min(-1) // tile_c).astype(jnp.int32)     # (B, H, n_k)
    hi = (chunks.max(-1) // tile_c).astype(jnp.int32)

    def kernel(lo_ref, hi_ref, idx_ref, gw_ref, out_ref):
        # One invocation per (batch, head, HW tile); the tap-chunk loop is
        # INTERNAL so grid size (and per-invocation DMA/launch overhead)
        # stays small — the 4D-grid variant spent more time on overhead
        # than compute.
        hh = pl.program_id(1)
        i = pl.program_id(2)
        out_ref[...] = jnp.zeros_like(out_ref)

        def body(k, carry):
            @pl.when((lo_ref[0, hh, k] <= i) & (i <= hi_ref[0, hh, k]))
            def _():
                cols = i * tile_c + jax.lax.broadcasted_iota(
                    jnp.int32, (tile_t, tile_c), 1)
                sub = idx_ref[0, hh, pl.ds(k * tile_t, tile_t)]
                onehot = (sub.reshape(tile_t, 1) == cols
                          ).astype(jnp.bfloat16)               # (Tc, C)
                gwc = gw_ref[0, 0, :, pl.ds(k * tile_t, tile_t)
                             ].astype(jnp.bfloat16)            # (dh, Tc)
                out_ref[0, 0] += jax.lax.dot_general(
                    gwc, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (dh, C)
            return carry

        jax.lax.fori_loop(0, n_k, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_h, n_c),
        in_specs=[
            pl.BlockSpec((1, n_h, n_k), lambda bb, hh, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_h, n_k), lambda bb, hh, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_h, t_pad), lambda bb, hh, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, t_pad),
                         lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, dh, tile_c),
                               lambda bb, hh, i: (bb, hh, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h, dh, hw_pad), jnp.float32),
    )(lo, hi, idx, gw.astype(jnp.float32))
    return out[..., :hw] if hw_pad != hw else out
