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

``ms_deform_attn`` below goes further: the WHOLE multi-scale deformable
attention core (all levels, bilinear taps, attention weighting, per-query
reduction) is one op with one Pallas forward and one Pallas backward.
Design (measured on v5e, see STATUS.md round 2):

  * XLA's row gather runs ~275x off speed-of-light for these shapes
    (19 ms for ~56 MB of useful traffic at b8/1024px) because each tap
    fetches a 128-byte row. Both directions therefore use one-hot MXU
    matmuls instead of gather/scatter instructions.
  * All L levels merge into ONE flat cell-index space, sorted once per
    (batch, head) with ``lax.sort`` (taps cluster around reference boxes,
    so sorted 512-tap chunks span few 1024-cell tiles; per-chunk [lo, hi]
    tile bounds skip the rest).
  * Everything runs TRANSPOSED — values (dh, HW), outputs (dh, Q) — so
    matmul outputs fill all 128 lanes (the untransposed (.., dh=32) form
    wastes 3/4 of the MXU).
  * The forward fuses gather + tap/attention weighting + scatter-to-query
    into the same kernel: out^T (dh, Q) += [v^T @ onehot_cells] * c @
    onehot_queries^T, where c = attn * bilinear weight. The backward
    mirrors it: dV^T stamps through the transposed one-hots, and a per-tap
    scalar s_t = <dOut[q_t], v[idx_t]> comes back (unsorted via a second
    key sort) for the attention/coordinate gradients, which are analytic
    elementwise expressions in XLA.

Precision / parity note: ``ms_deform_attn`` dispatches on
``jax.default_backend()`` at trace time, and the TPU kernels run the
one-hot tap matmuls in bfloat16 (f32 accumulation), so TPU numerics
intentionally diverge from the f32 XLA reference path (grad parity tests
use atol=5e-2). This mirrors the reference's amp=True training, but means
eval mAP computed on TPU vs CPU is close, not bit-identical — a backend
delta in the 3rd decimal of mAP is expected precision skew, not a bug.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


# ── Fused multi-scale deformable attention ───────────────────────────────
#
# One op for the whole sampling core (reference: the ms_deform_attn CUDA
# kernels; Ultralytics runs the pure-torch equivalent inside
# RTDETRDecoder). See the module docstring for the kernel design.

_INTERPRET = False          # tests flip this to run the kernels on CPU

_TILE_T = 512               # taps per sorted chunk
_TILE_C = 1024              # cells per value tile
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _merged_geometry(loc, shapes):
    """loc: (B, Q, n_h, L, P, 2) normalised [0,1] sampling locations.
    Returns (idx, w, dwx, dwy): (B, Q, n_h, L, P, 4) arrays over the
    merged flat cell-index space (level offsets applied); dwx/dwy are
    bilinear-weight derivatives wrt the PIXEL coords of each level."""
    per_level = []
    off = 0
    for l, (h, w) in enumerate(shapes):
        sx = loc[..., l, :, 0] * w - 0.5         # (B, Q, n_h, P)
        sy = loc[..., l, :, 1] * h - 0.5
        idxs, wgts, dxs, dys = _tap_geometry(sx, sy, h, w)
        per_level.append((jnp.stack(idxs, -1) + off, jnp.stack(wgts, -1),
                          jnp.stack(dxs, -1), jnp.stack(dys, -1)))
        off += h * w
    stack = lambda i: jnp.stack([pl_[i] for pl_ in per_level], -3)
    return stack(0), stack(1), stack(2), stack(3)   # (B,Q,n_h,L,P,4)


def _flatten_bh(x, b, n_h):
    """(B, Q, n_h, L, P, 4) -> (B*n_h, T) with tap order (q, l, p, tap)."""
    return x.transpose(0, 2, 1, 3, 4, 5).reshape(b * n_h, -1)


def ms_deform_attn(values, shapes, loc, attn):
    """Multi-scale deformable attention core.

    values: (B, HW_tot, n_h, dh) projected value maps, levels concatenated
        in ``shapes`` order (row-major per level).
    shapes: static tuple of (H_l, W_l) per level.
    loc:    (B, Q, n_h, L, P, 2) sampling locations, normalised [0, 1].
    attn:   (B, Q, n_h, L, P) attention weights (softmaxed over L*P).

    Returns (B, Q, n_h, dh) float32: sum over levels/points/taps of
    attention-and-bilinear-weighted values (zero outside each map).
    """
    if jax.default_backend() == "tpu" or _INTERPRET:
        return _ms_deform_attn_tpu(shapes, values, loc, attn)
    return ms_deform_attn_ref(values, shapes, loc, attn)


def ms_deform_attn_ref(values, shapes, loc, attn):
    """XLA reference path (CPU/GPU + ground truth for kernel tests)."""
    b, hw_tot, n_h, dh = values.shape
    idx, w, _, _ = _merged_geometry(loc, shapes)    # (B,Q,n_h,L,P,4)
    flat = values.reshape(b, hw_tot * n_h, dh)
    head_ids = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 2)
    gidx = idx * n_h + head_ids
    g = jnp.take_along_axis(
        flat, gidx.reshape(b, -1, 1), axis=1
    ).reshape(*idx.shape, dh)                       # (B,Q,n_h,L,P,4,dh)
    c = (w * attn[..., None]).astype(g.dtype)
    return (g * c[..., None]).sum((-4, -3, -2)).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ms_deform_attn_tpu(shapes, values, loc, attn):
    out, _ = _tpu_fwd(shapes, values, loc, attn)
    return out


def _sorted_taps(shapes, values, loc, attn, t_pad, hw_pad,
                 values_t=None):
    """Sort taps by merged cell index per (b*head) row; returns the sorted
    (idx, c, qof, pos) plus per-chunk tile bounds and v^T.

    values_t: optional (B, n_h, dh, HW_tot) pre-transposed value maps —
    skips the (B, HW, C) -> v^T relayout (a ~0.27 ms copy per decoder
    layer at bs8/1024px, device-traced)."""
    if values_t is not None:
        b, n_h, dh, hw_tot = values_t.shape
    else:
        b, hw_tot, n_h, dh = values.shape
    q = loc.shape[1]
    idx, w, _, _ = _merged_geometry(loc, shapes)
    c = w * attn[..., None]                          # (B,Q,n_h,L,P,4)
    qof = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    idx_f = _flatten_bh(idx, b, n_h)
    c_f = _flatten_bh(c, b, n_h).astype(jnp.float32)
    qof_f = _flatten_bh(qof, b, n_h)
    t = idx_f.shape[-1]
    bh = b * n_h
    pad = t_pad - t
    if pad:
        idx_f = jnp.pad(idx_f, ((0, 0), (0, pad)),
                        constant_values=hw_pad - 1)
        c_f = jnp.pad(c_f, ((0, 0), (0, pad)))
        qof_f = jnp.pad(qof_f, ((0, 0), (0, pad)))
    pos = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1), (bh, t_pad))
    taps_per_q = loc.shape[3] * loc.shape[4] * 4
    sb = (t_pad - 1).bit_length()
    if (hw_pad << sb) < 2 ** 31:
        # pack (cell, tap position) into one int31 key: halves the data
        # the O(n log^2 n) bitonic sort passes move, and pos/qof come back
        # by bit ops (tap order is (q, l, p, tap) so qof = pos // (L*P*4))
        key = (idx_f << sb) | pos
        # keys are unique (pos in the low bits) -> stability is free to
        # drop; the unstable network is ~20% cheaper on TPU
        skey, sc = jax.lax.sort((key, c_f), num_keys=1, is_stable=False)
        spos = skey & ((1 << sb) - 1)
        sidx = skey >> sb
        sqof = spos // taps_per_q
    else:
        sidx, sc, sqof, spos = jax.lax.sort(
            (idx_f, c_f, qof_f, pos), num_keys=1)
    n_k = t_pad // _TILE_T
    chunks = sidx.reshape(bh, n_k, _TILE_T)
    lo = (chunks.min(-1) // _TILE_C).astype(jnp.int32)[:, None]
    hi = (chunks.max(-1) // _TILE_C).astype(jnp.int32)[:, None]
    if values_t is not None:
        vt = values_t.reshape(bh, dh, hw_tot)
    else:
        vt = values.transpose(0, 2, 3, 1).reshape(bh, dh, hw_tot)
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, hw_pad - hw_tot))
                 ).astype(jnp.bfloat16)
    return (sidx.reshape(bh, n_k, 1, _TILE_T),
            sc.reshape(bh, n_k, 1, _TILE_T),
            sqof.reshape(bh, n_k, 1, _TILE_T), spos, lo, hi, vt)


def _tpu_fwd(shapes, values, loc, attn):
    b, hw_tot, n_h, dh = values.shape
    q = loc.shape[1]
    t = q * loc.shape[3] * loc.shape[4] * 4
    t_pad = _round_up(t, _TILE_T)
    hw_pad = _round_up(hw_tot, _TILE_C)
    q_pad = max(_round_up(q, _LANE), _LANE)
    sidx, sc, sqof, spos, lo, hi, vt = _sorted_taps(
        shapes, values, loc, attn, t_pad, hw_pad)
    out_t = _fwd_pallas(sidx, sc, sqof, lo, hi, vt, q_pad)
    out = out_t.reshape(b, n_h, dh, q_pad)[..., :q].transpose(0, 3, 1, 2)
    return out, (values, loc, attn, sidx, sc, sqof, spos, lo, hi, vt)


@functools.partial(jax.jit, static_argnames=("q_pad",))
def _fwd_pallas(sidx, sc, sqof, lo, hi, vt, q_pad: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_k, _, tile_t = sidx.shape
    _, dh, hw_pad = vt.shape
    n_c = hw_pad // _TILE_C

    def kernel(lo_ref, hi_ref, idx_ref, c_ref, qof_ref, v_ref, out_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        ids = idx_ref[0, 0, 0, :]
        def gather(cc, acc):
            colsub = cc * _TILE_C + jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_C, tile_t), 0)
            oh = (ids.reshape(1, tile_t) == colsub).astype(jnp.bfloat16)
            vv = v_ref[0, :, pl.ds(cc * _TILE_C, _TILE_C)]
            return acc + jax.lax.dot_general(
                vv, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        g = jax.lax.fori_loop(lo_ref[0, 0, k], hi_ref[0, 0, k] + 1, gather,
                              jnp.zeros((dh, tile_t), jnp.float32))
        gw = (g * c_ref[0, 0, 0, :].reshape(1, tile_t)).astype(jnp.bfloat16)
        qcols = jax.lax.broadcasted_iota(jnp.int32, (q_pad, tile_t), 0)
        ohq = (qof_ref[0, 0, 0, :].reshape(1, tile_t) == qcols
               ).astype(jnp.bfloat16)
        out_ref[0] += jax.lax.dot_general(
            gw, ohq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (dh, q_pad)

    return pl.pallas_call(
        kernel,
        grid=(bh, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, hw_pad), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dh, q_pad), lambda b_, k: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, dh, q_pad), jnp.float32),
        interpret=_INTERPRET,
    )(lo, hi, sidx, sc, sqof, vt)


def _tpu_bwd(shapes, res, dout):
    values, loc, attn, sidx, sc, sqof, spos, lo, hi, vt = res
    b, hw_tot, n_h, dh = values.shape
    dv_t, dloc, dattn = _tpu_bwd_core(
        shapes, (loc, attn, sidx, sc, sqof, spos, lo, hi, vt), dout,
        b, n_h, dh, hw_tot)
    dvalues = dv_t.reshape(b, n_h, dh, -1)[..., :hw_tot].transpose(
        0, 3, 1, 2).astype(values.dtype)
    return dvalues, dloc.astype(loc.dtype), dattn.astype(attn.dtype)


def _tpu_bwd_t(shapes, res, dout):
    values_t, loc, attn, sidx, sc, sqof, spos, lo, hi, vt = res
    b, n_h, dh, hw_tot = values_t.shape
    dv_t, dloc, dattn = _tpu_bwd_core(
        shapes, (loc, attn, sidx, sc, sqof, spos, lo, hi, vt), dout,
        b, n_h, dh, hw_tot)
    dvalues_t = dv_t.reshape(b, n_h, dh, -1)[..., :hw_tot].astype(
        values_t.dtype)
    return dvalues_t, dloc.astype(loc.dtype), dattn.astype(attn.dtype)


def _tpu_bwd_core(shapes, res, dout, b, n_h, dh, hw_tot):
    (loc, attn, sidx, sc, sqof, spos, lo, hi, vt) = res
    q = loc.shape[1]
    n_l, n_p = loc.shape[3], loc.shape[4]
    t = q * n_l * n_p * 4
    bh, n_k, _, tile_t = sidx.shape
    t_pad = n_k * tile_t
    q_pad = max(_round_up(q, _LANE), _LANE)

    dout_t = jnp.pad(dout.astype(jnp.float32),
                     ((0, 0), (0, q_pad - q), (0, 0), (0, 0))
                     ).transpose(0, 2, 3, 1).reshape(bh, dh, q_pad)
    dv_t, s_sorted = _bwd_pallas(sidx, sc, sqof, lo, hi, vt,
                                 dout_t.astype(jnp.bfloat16))

    # unsort the per-tap scalars: sorting by pos restores the original tap
    # order (pos was carried through the forward sort). When pos fits in
    # 15 bits, pack (pos << 16 | bf16-bits of s) into ONE int32 so the
    # bitonic network moves one array instead of a key + f32 payload
    # (~2x less data; bf16 matches the tap-matmul precision these
    # gradients already carry — see the module parity note).
    s_flat = s_sorted.reshape(bh, t_pad)
    if t_pad < (1 << 15):
        s_bits = jax.lax.bitcast_convert_type(
            s_flat.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
        packed = (spos << 16) | s_bits
        (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
        s = jax.lax.bitcast_convert_type(
            (sp & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
    else:
        _, s = jax.lax.sort((spos, s_flat), num_keys=1)
    s = s[:, :t].reshape(b, n_h, q, n_l, n_p, 4).transpose(0, 2, 1, 3, 4, 5)

    _, w, dwx, dwy = _merged_geometry(loc, shapes)   # (B,Q,n_h,L,P,4)
    dattn = (s * w).sum(-1)                          # dL/dattn
    ds_pix = s * attn[..., None]                     # dL/dw_tap
    dsx = (ds_pix * dwx).sum(-1)                     # (B,Q,n_h,L,P)
    dsy = (ds_pix * dwy).sum(-1)
    scale = jnp.asarray([(w_, h_) for (h_, w_) in shapes],
                        jnp.float32)                 # (L, 2) pixel scales
    dloc = jnp.stack([dsx, dsy], -1) * scale[None, None, None, :, None, :]
    return dv_t, dloc, dattn


@jax.jit
def _bwd_pallas(sidx, sc, sqof, lo, hi, vt, dout_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_k, _, tile_t = sidx.shape
    _, dh, hw_pad = vt.shape
    q_pad = dout_t.shape[-1]
    n_c = hw_pad // _TILE_C

    def kernel(lo_ref, hi_ref, idx_ref, c_ref, qof_ref, v_ref, dout_ref,
               dv_ref, s_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            dv_ref[...] = jnp.zeros_like(dv_ref)

        ids = idx_ref[0, 0, 0, :]
        qcols = jax.lax.broadcasted_iota(jnp.int32, (q_pad, tile_t), 0)
        ohq = (qof_ref[0, 0, 0, :].reshape(1, tile_t) == qcols
               ).astype(jnp.bfloat16)
        dout_tap = jax.lax.dot_general(
            dout_ref[0], ohq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (dh, tile_t)

        gw = (dout_tap * c_ref[0, 0, 0, :].reshape(1, tile_t)
              ).astype(jnp.bfloat16)

        # ONE pass per [lo, hi] value tile: the tap one-hot is built once
        # and feeds BOTH matmuls — the gather for the per-tap scalars
        # (s is linear in g, so it accumulates tile-by-tile) and the dV
        # stamp. The previous two-loop form built every one-hot twice
        # (the build is VPU compare/select work comparable to the MXU
        # matmuls it feeds — fusing measured the 6-layer bwd chain down).
        def visit(cc, s_acc):
            colsub = cc * _TILE_C + jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_C, tile_t), 0)
            oh = (ids.reshape(1, tile_t) == colsub).astype(jnp.bfloat16)
            vv = v_ref[0, :, pl.ds(cc * _TILE_C, _TILE_C)]
            g_tile = jax.lax.dot_general(
                vv, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (dh, tile_t)
            s_acc = s_acc + (g_tile * dout_tap).sum(0)
            cur = dv_ref[0, :, pl.ds(cc * _TILE_C, _TILE_C)]
            dv_ref[0, :, pl.ds(cc * _TILE_C, _TILE_C)] = (
                cur + jax.lax.dot_general(
                    gw, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return s_acc
        s_ref[0, 0, 0, :] = jax.lax.fori_loop(
            lo_ref[0, 0, k], hi_ref[0, 0, k] + 1, visit,
            jnp.zeros((tile_t,), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(bh, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, hw_pad), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, q_pad), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, dh, hw_pad), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, dh, hw_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_k, 1, tile_t), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(lo, hi, sidx, sc, sqof, vt, dout_t)


def _tpu_fwd_rule(shapes, values, loc, attn):
    return _tpu_fwd(shapes, values, loc, attn)


_ms_deform_attn_tpu.defvjp(_tpu_fwd_rule, _tpu_bwd)


# ── transposed-values variant ────────────────────────────────────────────

def _tpu_fwd_t(shapes, values_t, loc, attn):
    b, n_h, dh, hw_tot = values_t.shape
    q = loc.shape[1]
    t = q * loc.shape[3] * loc.shape[4] * 4
    t_pad = _round_up(t, _TILE_T)
    hw_pad = _round_up(hw_tot, _TILE_C)
    q_pad = max(_round_up(q, _LANE), _LANE)
    sidx, sc, sqof, spos, lo, hi, vt = _sorted_taps(
        shapes, None, loc, attn, t_pad, hw_pad, values_t=values_t)
    out_t = _fwd_pallas(sidx, sc, sqof, lo, hi, vt, q_pad)
    out = out_t.reshape(b, n_h, dh, q_pad)[..., :q].transpose(0, 3, 1, 2)
    return out, (values_t, loc, attn, sidx, sc, sqof, spos, lo, hi, vt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ms_deform_attn_tpu_t(shapes, values_t, loc, attn):
    out, _ = _tpu_fwd_t(shapes, values_t, loc, attn)
    return out


_ms_deform_attn_tpu_t.defvjp(_tpu_fwd_t, _tpu_bwd_t)


# ── slot-layout multi-scale deformable attention ─────────────────────────
#
# Third-generation kernel pair. Taps are laid out LEVEL-MAJOR and
# QUERY-BLOCKED — (head, level, query, point, tap) — instead of sorted by
# destination cell. One (level, query) pair owns a contiguous "slot" of
# P*4 taps, which buys three things over the sorted layout above:
#
#   * the per-query output reduction and the backward's per-tap dout
#     expansion become tiny block-diagonal selector matmuls (a 128 x T
#     iota compare) instead of Q_pad x T one-hot builds — the one-hot
#     compares, not the MXU matmuls, dominate these kernels on TPU;
#   * NO tap sort in the forward and NO unsort in the backward: the
#     per-tap scalars come back in deterministic slot order (the sorted
#     layout burned one ~24k-lane bitonic sort per decoder layer per
#     direction);
#   * geometry prep is one level-vectorised pass (`_geometry_batched`)
#     instead of a per-level Python loop of small XLA ops.
#
# Spatial locality — narrow [lo, hi] value-tile bounds per tap chunk,
# which is what makes the gather loop cheap — comes from the CALLER
# ordering queries spatially (RTDETR applies one decoder-level
# permutation shared by all 6 layers; see models/rtdetr.py) rather than
# from sorting taps per layer. Any query order is CORRECT; sorted order
# is fast. Reference semantics are unchanged
# (Deformable-DETR ms_deform_attn, SURVEY.md §2.2 RT-DETR row).


def _slot_sizes(n_p: int) -> Tuple[int, int, int]:
    """Returns (s_w, tile_t, n_slots): slot width (taps per (level, query)
    pair), taps per kernel chunk (multiple of both s_w and 128, capped so
    the slot count fits one 128-lane selector), slots per chunk."""
    import math as _m
    s_w = n_p * 4
    base = (s_w * 128) // _m.gcd(s_w, 128)
    tile_t = base
    while tile_t + base <= 768 and (tile_t + base) // s_w <= 128:
        tile_t += base
    return s_w, tile_t, tile_t // s_w


def _geometry_batched(loc, shapes):
    """Level-vectorised tap geometry. loc: (B, Q, n_h, L, P, 2) normalised
    [0,1]. Returns (idx, w, dwx, dwy), each (B, Q, n_h, L, P, 4) over the
    merged flat cell space (level offsets applied); dwx/dwy are wrt the
    PIXEL coords of each level."""
    w_l = jnp.asarray([w for (h, w) in shapes], jnp.float32)[:, None]
    h_l = jnp.asarray([h for (h, w) in shapes], jnp.float32)[:, None]
    wi_l = w_l.astype(jnp.int32)
    offs = np.concatenate(
        [[0], np.cumsum([h * w for (h, w) in shapes])[:-1]])
    off_l = jnp.asarray(offs, jnp.int32)[:, None, None]       # (L, 1, 1)
    sx = loc[..., 0] * w_l - 0.5                              # (B,Q,H,L,P)
    sy = loc[..., 1] * h_l - 0.5
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
        inside = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
        xi_c = jnp.clip(xi, 0, w_l - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h_l - 1).astype(jnp.int32)
        idxs.append(yi_c * wi_l + xi_c)
        wgts.append(jnp.where(inside, wgt, 0.0))
        dxs.append(jnp.where(inside, dwx, 0.0))
        dys.append(jnp.where(inside, dwy, 0.0))
    return (jnp.stack(idxs, -1) + off_l, jnp.stack(wgts, -1),
            jnp.stack(dxs, -1), jnp.stack(dys, -1))


def _slot_layout(x, b, n_h):
    """(B, Q, n_h, L, P, 4) -> (B*n_h, L*Q*P*4), tap order (l, q, p, tap)."""
    return x.transpose(0, 2, 3, 1, 4, 5).reshape(b * n_h, -1)


def ms_deform_attn_slots(values_t, shapes, loc, attn):
    """:func:`ms_deform_attn` with slot-layout kernels and pre-transposed
    value maps. Args/returns as :func:`ms_deform_attn_t`. Queries SHOULD be
    spatially ordered by the caller for peak performance; any order is
    correct."""
    if jax.default_backend() == "tpu" or _INTERPRET:
        return _ms_deform_slots_tpu(shapes, values_t, loc, attn)
    b, n_h, dh, hw = values_t.shape
    values = values_t.reshape(b, n_h * dh, hw).transpose(0, 2, 1).reshape(
        b, hw, n_h, dh)
    return ms_deform_attn_ref(values, shapes, loc, attn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ms_deform_slots_tpu(shapes, values_t, loc, attn):
    out, _ = _slots_fwd(shapes, values_t, loc, attn)
    return out


def _slots_prep(shapes, values_t, loc, attn):
    """Pad Q to a whole number of chunks, build slot-ordered taps and
    per-chunk value-tile bounds, and pad v^T to the tile grid."""
    b, n_h, dh, hw_tot = values_t.shape
    q = loc.shape[1]
    n_l, n_p = loc.shape[3], loc.shape[4]
    s_w, tile_t, n_slots = _slot_sizes(n_p)
    q3 = q
    while (n_l * q3 * s_w) % tile_t:
        q3 += 1
    if q3 != q:
        pad = q3 - q
        loc = jnp.pad(loc, ((0, 0), (0, pad)) + ((0, 0),) * 4,
                      constant_values=0.5)
        attn = jnp.pad(attn, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    idx, w, _, _ = _geometry_batched(loc, shapes)
    c = (w * attn[..., None]).astype(jnp.float32)
    idx_f = _slot_layout(idx, b, n_h)                # (bh, T)
    c_f = _slot_layout(c, b, n_h)
    bh, t_pad = idx_f.shape
    n_k = t_pad // tile_t
    chunks = idx_f.reshape(bh, n_k, tile_t)
    lo = (chunks.min(-1) // _TILE_C).astype(jnp.int32)[:, None]
    hi = (chunks.max(-1) // _TILE_C).astype(jnp.int32)[:, None]
    hw_pad = _round_up(hw_tot, _TILE_C)
    # factorised value layout: tile cc, sub-row hi (cell // 128 within the
    # tile), dh, cell % 128 — the kernels read tile cc as one (8*dh, 128)
    # full-M matmul operand (see the kernel docstrings)
    vt = values_t.reshape(bh, dh, hw_tot)
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, hw_pad - hw_tot))
                 ).astype(jnp.bfloat16)
    n_hi = _TILE_C // 128
    vt = vt.reshape(bh, dh, hw_pad // _TILE_C, n_hi, 128
                    ).transpose(0, 2, 3, 1, 4)      # (bh, n_c, 8, dh, 128)
    return (idx_f.reshape(bh, n_k, 1, tile_t),
            c_f.reshape(bh, n_k, 1, tile_t), lo, hi, vt,
            (q3, s_w, tile_t, n_slots, n_k))


def _slots_fwd(shapes, values_t, loc, attn):
    b, n_h, dh, hw_tot = values_t.shape
    q = loc.shape[1]
    n_l = loc.shape[3]
    sidx, sc, lo, hi, vt, sizes = _slots_prep(shapes, values_t, loc, attn)
    q3, s_w, tile_t, n_slots, n_k = sizes
    out_slots = _slots_fwd_pallas(sidx, sc, lo, hi, vt, s_w)
    # fold slots -> queries: (l, q) slot sums add over levels
    bh = b * n_h
    slots = out_slots[..., :n_slots].transpose(0, 1, 3, 2)
    out = slots.reshape(bh, n_l, q3, dh).sum(1)[:, :q]
    out = out.reshape(b, n_h, q, dh).transpose(0, 2, 1, 3)
    return out, (values_t, loc, attn, sidx, sc, lo, hi, vt, sizes)


@functools.partial(jax.jit, static_argnames=("s_w",))
def _slots_fwd_pallas(sidx, sc, lo, hi, vt, s_w: int):
    """Factorised gather: the tap one-hot over a 1024-cell tile splits into
    a 128-row LOW one-hot B[c_lo, t] = (idx % 128 == c_lo), built ONCE per
    chunk, and a tiny 8-row HIGH mask A[hh, t] = (idx // 128 == tile row)
    per visited tile. The gather is then one full-M (8*dh, 128) @ B matmul
    followed by a select-sum over the 8 rows — ~4x less VPU compare work
    per visit and full MXU row utilisation vs a (1024, T) one-hot."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_k, _, tile_t = sidx.shape
    _, n_c, n_hi, dh, _ = vt.shape

    def kernel(lo_ref, hi_ref, idx_ref, c_ref, v_ref, out_ref):
        k = pl.program_id(1)
        ids = idx_ref[0, 0, 0, :]
        lo_bits = (ids & 127).reshape(1, tile_t)
        hi_bits = (ids // 128).reshape(1, tile_t)
        b_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, tile_t), 0)
                == lo_bits).astype(jnp.bfloat16)          # (128, T)

        def gather(cc, acc):
            w = v_ref[0, cc].reshape(n_hi * dh, 128)      # (8*dh, 128)
            u = jax.lax.dot_general(
                w, b_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8*dh, T)
            for hh in range(n_hi):
                a = (hi_bits == cc * n_hi + hh).astype(jnp.float32)
                acc = acc + u[hh * dh:(hh + 1) * dh] * a
            return acc
        g = jax.lax.fori_loop(lo_ref[0, 0, k], hi_ref[0, 0, k] + 1, gather,
                              jnp.zeros((dh, tile_t), jnp.float32))
        gw = (g * c_ref[0, 0, 0, :].reshape(1, tile_t)).astype(jnp.bfloat16)
        # block-diagonal slot selector: sel[j, t] = (t // s_w == j), built
        # with mul+compare only (Mosaic-safe for any slot width)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (128, tile_t), 0)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (128, tile_t), 1)
        sel = ((tcol >= jrow * s_w) & (tcol < (jrow + 1) * s_w)
               ).astype(jnp.bfloat16)
        out_ref[0, 0] = jax.lax.dot_general(
            gw, sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (dh, 128)

    return pl.pallas_call(
        kernel,
        grid=(bh, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_c, n_hi, dh, 128),
                         lambda b_, k: (b_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, dh, 128), lambda b_, k: (b_, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_k, dh, 128), jnp.float32),
        interpret=_INTERPRET,
    )(lo, hi, sidx, sc, vt)


def _slots_bwd(shapes, res, dout):
    values_t, loc, attn, sidx, sc, lo, hi, vt, sizes = res
    b, n_h, dh, hw_tot = values_t.shape
    q = loc.shape[1]
    n_l, n_p = loc.shape[3], loc.shape[4]
    q3, s_w, tile_t, n_slots, n_k = sizes
    bh = b * n_h

    # dout -> per-(level, query) slot cotangents, chunk-blocked
    dout_t = jnp.pad(dout.astype(jnp.float32),
                     ((0, 0), (0, q3 - q), (0, 0), (0, 0))
                     ).transpose(0, 2, 3, 1).reshape(bh, dh, q3)
    dslot = jnp.tile(dout_t, (1, 1, n_l)).reshape(bh, dh, n_k, n_slots)
    dslot = jnp.pad(dslot.transpose(0, 2, 1, 3),
                    ((0, 0), (0, 0), (0, 0), (0, 128 - n_slots))
                    ).astype(jnp.bfloat16)            # (bh, n_k, dh, 128)

    dv4, s = _slots_bwd_pallas(sidx, sc, lo, hi, vt, dslot, s_w)
    # (bh, n_c, 8, dh, 128) -> (bh, dh, hw_pad) -> trim tile padding
    dv_t = dv4.transpose(0, 3, 1, 2, 4).reshape(bh, dh, -1)
    dvalues_t = dv_t[..., :hw_tot].reshape(
        b, n_h, dh, hw_tot).astype(values_t.dtype)

    # per-tap scalars arrive in deterministic slot order — no unsort
    s = s.reshape(b, n_h, n_l, q3, n_p, 4)[:, :, :, :q]
    s = s.transpose(0, 3, 1, 2, 4, 5)                 # (B,Q,H,L,P,4)
    _, w, dwx, dwy = _geometry_batched(loc, shapes)
    dattn = (s * w).sum(-1)
    ds_pix = s * attn[..., None]
    dsx = (ds_pix * dwx).sum(-1)
    dsy = (ds_pix * dwy).sum(-1)
    scale = jnp.asarray([(w_, h_) for (h_, w_) in shapes], jnp.float32)
    dloc = jnp.stack([dsx, dsy], -1) * scale[None, None, None, :, None, :]
    return dvalues_t, dloc.astype(loc.dtype), dattn.astype(attn.dtype)


@functools.partial(jax.jit, static_argnames=("s_w",))
def _slots_bwd_pallas(sidx, sc, lo, hi, vt, dslot, s_w: int):
    """Backward with the same high/low one-hot factorisation as the
    forward: per visited tile, the re-gather for the per-tap scalars is
    (8*dh, 128) @ B + select-sum, and the dV stamp builds the (8*dh, T)
    high-masked gradient stack once and lands the whole tile with ONE
    full-M matmul against B^T, accumulating straight into the factorised
    (n_c, 8, dh, 128) dV layout."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n_k, _, tile_t = sidx.shape
    _, n_c, n_hi, dh, _ = vt.shape

    def kernel(lo_ref, hi_ref, idx_ref, c_ref, v_ref, dslot_ref,
               dv_ref, s_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            dv_ref[...] = jnp.zeros_like(dv_ref)

        ids = idx_ref[0, 0, 0, :]
        lo_bits = (ids & 127).reshape(1, tile_t)
        hi_bits = (ids // 128).reshape(1, tile_t)
        b_lo = (jax.lax.broadcasted_iota(jnp.int32, (128, tile_t), 0)
                == lo_bits).astype(jnp.bfloat16)          # (128, T)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (128, tile_t), 0)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (128, tile_t), 1)
        sel = ((tcol >= jrow * s_w) & (tcol < (jrow + 1) * s_w)
               ).astype(jnp.bfloat16)
        dout_tap = jax.lax.dot_general(
            dslot_ref[0, 0], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (dh, tile_t)
        gw = (dout_tap * c_ref[0, 0, 0, :].reshape(1, tile_t)
              ).astype(jnp.bfloat16)

        def visit(cc, s_acc):
            w = v_ref[0, cc].reshape(n_hi * dh, 128)
            u = jax.lax.dot_general(
                w, b_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8*dh, T)
            masks = [(hi_bits == cc * n_hi + hh).astype(jnp.float32)
                     for hh in range(n_hi)]
            g = sum(u[hh * dh:(hh + 1) * dh] * masks[hh]
                    for hh in range(n_hi))                # (dh, T)
            s_acc = s_acc + (g * dout_tap).sum(0)
            # dV: stack the high-masked tap gradients and stamp the whole
            # tile with one matmul against B^T
            ga = jnp.concatenate(
                [gw * masks[hh].astype(jnp.bfloat16) for hh in range(n_hi)],
                axis=0)                                   # (8*dh, T)
            stamp = jax.lax.dot_general(
                ga, b_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8*dh, 128)
            dv_ref[0, cc] = dv_ref[0, cc] + stamp.reshape(n_hi, dh, 128)
            return s_acc
        s_ref[0, 0, 0, :] = jax.lax.fori_loop(
            lo_ref[0, 0, k], hi_ref[0, 0, k] + 1, visit,
            jnp.zeros((tile_t,), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(bh, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_k), lambda b_, k: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_c, n_hi, dh, 128),
                         lambda b_, k: (b_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, 128), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_c, n_hi, dh, 128),
                         lambda b_, k: (b_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t), lambda b_, k: (b_, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_c, n_hi, dh, 128), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_k, 1, tile_t), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(lo, hi, sidx, sc, vt, dslot)


_ms_deform_slots_tpu.defvjp(_slots_fwd, _slots_bwd)


def ms_deform_attn_t(values_t, shapes, loc, attn):
    """:func:`ms_deform_attn` taking PRE-TRANSPOSED value maps.

    values_t: (B, n_h, dh, HW_tot) — exactly the v^T layout the kernels
    consume. A producer that emits this natively (e.g. a value projection
    computed as kernel^T @ memory^T) avoids one (B, HW, C) relayout copy
    per call in each direction: ~0.27 ms x 6 decoder layers x fwd+bwd at
    RT-DETR bs8/1024px (device-traced). Other args/returns as
    :func:`ms_deform_attn`."""
    if jax.default_backend() == "tpu" or _INTERPRET:
        return _ms_deform_attn_tpu_t(shapes, values_t, loc, attn)
    b, n_h, dh, hw = values_t.shape
    values = values_t.reshape(b, n_h * dh, hw).transpose(0, 2, 1).reshape(
        b, hw, n_h, dh)
    return ms_deform_attn_ref(values, shapes, loc, attn)
