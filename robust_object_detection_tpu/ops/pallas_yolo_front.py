"""Fused Pallas YOLOv8 front: the P1/P2 stride-2 convs in planes layout.

WHY. At (16, 1024, 1024, 3) the YOLOv8m front — Conv3x3/2 3->48 + BN +
SiLU, Conv3x3/2 48->96 + BN + SiLU — costs ~25 ms fwd+bwd under XLA on
v5e (device-traced: the 3->48 conv alone is 4.3 ms fwd + 4.3 ms wgrad,
plus ~12 ms of BN stat/normalise reduce-fusions and a 1.9 ms input
relayout copy). Every tensor has 3..96 channels, so the NHWC lane
dimension is 1.3..42x padded. Same disease as the RT-DETR HGStem; same
planes-layout cure (ops/pallas_stem.py machinery), with one new trick:

  * THE PHASE-SPLIT LAYOUT. A stride-2 conv consumer needs its input
    split into even/odd columns, but strided lane slices are not
    expressible in Mosaic and cost ~4 ms of XLA whiles+copies per split
    at this size (measured — an XLA-split first version of this module
    was net NEUTRAL because of exactly that glue). Instead the P1 kernel
    computes even and odd output columns as TWO matmuls from 4-phase
    column-split inputs and stacks them in SUBLANES: each stored y1 row
    is (2*c1, W/4) = [even-column channels; odd-column channels].
    Sublane slicing IS supported, so the P2 kernel (and every backward
    kernel) reads the halves directly — no XLA split, no interleave, no
    relayout exists anywhere in the chain.
  * train-mode BatchNorm is DEFERRED: conv kernels emit per-block
    (sum, sum-of-squares) partials; XLA reduces them to mean/var (tiny
    (C,) math) and the next kernel applies the folded (g, b) + SiLU on
    the fly while reading.
  * the backward mirrors the forward: the P2 backward kernel folds the
    BN2 stats cotangent in-stream (deff = dy2 + ds2 + 2 y2 dss2), emits
    dK2, the chained dy1 = dA1 * silu'(z1) * g1 (phase-split layout),
    and the BN1 (dg, db) partials in one pass; the P1 backward emits dK1
    only — the input is the image, so no dX scatter exists at all.

SiLU (not ReLU): silu'(z) = sig(z) (1 + z (1 - sig(z))), recomputed
in-kernel from the stored pre-BN conv outputs.

Row conventions: y1 storage row s holds data row t = s - 1 (one zero
row above, so halo windows stay 8-aligned); the 4-phase input tensors
are +3-row-shifted for the same reason (P1 writes shifted rows, so its
input taps 2t+dy-1 land at phase storage row i0*2R + 2r + dy for output
block i0, local row r — identical indexing to the HGStem kernels).

Public entries: :func:`front_fused` (train, custom VJP, returns the
pre-BN2 P2 output + both batch stats) and :func:`front_fused_inference`
(running stats). The caller applies BN2 + SiLU (cheap planes math) and
owns the running-stat updates — same contract as pallas_stem.stem_fused.

Parity contract: matches the XLA ConvBnAct chain (flax BatchNorm
momentum 0.97 / eps 1e-3) up to bf16/f32 accumulation order;
tests/test_pallas_yolo_front.py asserts value + grad parity against the
XLA reference in interpret mode.

Reference counterpart: the first two `Conv` modules of Ultralytics
YOLOv8's CSPDarknet backbone (SURVEY.md §2.2 YOLOv8m capability row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_stem import (EPS, R, _DBuf, _acc_stats, _bn_chain,
                          _combine_stats, _fold_bn, _interpret, _kT,
                          _pad_top, _roll_left_masked,
                          _roll_right_masked, _round8, _stats_rows,
                          _vec_tile)


def _silu_f32(z):
    return z * jax.nn.sigmoid(z)


def _dsilu_f32(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _round4(n):
    return -(-n // 4) * 4


def _prep4(x, dtype):
    """(B, H, W, 3) -> 4 phase tensors (B, HP, 4, W4), phase p lane j =
    input column 4j + p, rows +3-shifted with zero pad (see module
    docstring), channels padded 3 -> 4 (sublane-tile-aligned DMA)."""
    b, h, w, cin = x.shape
    w4 = w // 4
    hp = _round8(h + 2 * R + 8)
    xp = x.astype(dtype)
    phases = []
    for p in range(4):
        t = xp[:, :, p::4, :].transpose(0, 1, 3, 2)      # (B, H, 3, W4)
        pad = ((0, 0), (3, hp - h - 3), (0, _round4(cin) - cin), (0, 0))
        phases.append(jnp.pad(t, pad))
    return phases


def _phase_tiles(rows, w4, dtype):
    """rows: dict p -> (cin, W4) input rows for one dy. Returns the
    even/odd patch tile pieces in (dx) order."""
    x0, x1, x2, x3 = rows
    even = [_roll_right_masked(x3, w4), x0, x1]    # cols 4m-1, 4m, 4m+1
    odd = [x1, x2, x3]                             # cols 4m+1, 4m+2, 4m+3
    return even, odd


# ── forward kernels ──────────────────────────────────────────────────────

def _front1_kernel(x0_hbm, x1_hbm, x2_hbm, x3_hbm, kT_ref, y_ref,
                   stats_ref, s0, s1, s2, s3, m0, m1, m2, m3,
                   *, w4, cin, c1, h2, dtype):
    """P1 3x3/2 conv, phase-split output. Block i0 writes storage rows
    [i0*R, i0*R+R) holding data rows t = i0*R + r - 1 (one zero row at
    the top); rows outside [0, h2) write zeros. Each row is (2*c1, W4) =
    [even output columns; odd output columns], two MXU matmuls."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(x0_hbm, s0, m0, 2 * R), (x1_hbm, s1, m1, 2 * R),
                  (x2_hbm, s2, m2, 2 * R), (x3_hbm, s3, m3, 2 * R)],
                 b, i0, pl.num_programs(1)).run()
    kT = kT_ref[...].astype(dtype)                       # (c1, 9*cin)
    acc_s = jnp.zeros((c1, 1), jnp.float32)
    acc_ss = jnp.zeros((c1, 1), jnp.float32)
    for r in range(R):
        t = i0 * R + r - 1
        te, to = [], []
        for dy in range(3):
            # x data row 2t+dy-1 -> phase storage row 2t+dy+2, local
            # 2r+dy (window starts at i0*2R; 2t+dy+2 = i0*2R + 2r + dy)
            rows = [s[slot, 2 * r + dy].astype(dtype)
                    for s in (s0, s1, s2, s3)]
            e, o = _phase_tiles(rows, w4, dtype)
            te += e
            to += o
        ok = jnp.logical_and(t >= 0, t < h2)
        ye = jax.lax.dot_general(
            kT, jnp.concatenate(te, 0), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (c1, W4)
        yo = jax.lax.dot_general(
            kT, jnp.concatenate(to, 0), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ye = jnp.where(ok, ye, 0.0).astype(y_ref.dtype)
        yo = jnp.where(ok, yo, 0.0).astype(y_ref.dtype)
        y_ref[r] = jnp.concatenate([ye, yo], 0)          # (2c1, W4)
        acc_s, acc_ss = _acc_stats(acc_s, acc_ss, ye)
        acc_s, acc_ss = _acc_stats(acc_s, acc_ss, yo)
    stats_ref[...] = _stats_rows(acc_s, acc_ss, stats_ref.shape[0])


def _s2silu_kernel(y1_hbm, kT_ref, g_ref, b_ref, o_ref, stats_ref,
                   sy, sem_y, *, w4, c1, c2, h2, dtype):
    """P2 3x3/2 conv on a1 = silu(g1*y1 + b1), phase-split input.

    y1 rows are (2c1, W4) [even; odd], +1-row-shifted. Output column m
    taps input columns 2m-1 (odd[m-1], right-rolled), 2m (even[m]),
    2m+1 (odd[m]) — the HGStem stem3 pattern with halves from sublane
    slices of one source."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(y1_hbm, sy, sem_y, 2 * R)], b, i0,
                 pl.num_programs(1)).run()
    kT = kT_ref[...].astype(dtype)                       # (c2, 9*c1)
    g = g_ref[:c1, 0:1]
    bb = b_ref[:c1, 0:1]

    def halves(local):
        t = i0 * 2 * R + local - 1                       # y1 data row
        row = sy[slot, local].astype(jnp.float32)        # (2c1, W4)
        a = _silu_f32(row * jnp.concatenate([g, g], 0)
                      + jnp.concatenate([bb, bb], 0))
        ok = jnp.logical_and(t >= 0, t < h2)
        a = jnp.where(ok, a, 0.0).astype(dtype)
        return a[:c1], a[c1:]

    acc_s = jnp.zeros((c2, 1), jnp.float32)
    acc_ss = jnp.zeros((c2, 1), jnp.float32)
    for r in range(R):
        tiles = []
        for dy in range(3):
            ae, ao = halves(2 * r + dy)
            tiles.append(_roll_right_masked(ao, w4))
            tiles.append(ae)
            tiles.append(ao)
        xT = jnp.concatenate(tiles, 0)                   # (9*c1, W4)
        y = jax.lax.dot_general(
            kT, xT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (c2, W4)
        yc = y.astype(o_ref.dtype)
        o_ref[r] = yc
        acc_s, acc_ss = _acc_stats(acc_s, acc_ss, yc)
    stats_ref[...] = _stats_rows(acc_s, acc_ss, stats_ref.shape[0])


# ── backward kernels ─────────────────────────────────────────────────────

def _s2silu_bwd_kernel(y1_hbm, dy2p_hbm, y2p_hbm, kflat_ref, g_ref,
                       b_ref, ds2_ref, dss2_ref,
                       dk_ref, dy1_ref, gacc_ref,
                       sy, sdy, syo, sem_y, sem_d, sem_o,
                       *, w4, c1, c2, h2, h4, dtype):
    """P2 backward: folds the BN2 stats cotangent in-stream
    (deff = dy2 + ds2 + 2*y2*dss2), accumulates dk2 += A^T @ deff^T,
    emits the chained dy1 = dA1 * silu'(z1) * g1 in the phase-split
    layout (direct rows), and the BN1 (dg, db) partials."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(y1_hbm, sy, sem_y, 2 * R), (dy2p_hbm, sdy, sem_d, R),
                  (y2p_hbm, syo, sem_o, R)],
                 b, i0, pl.num_programs(1)).run()
    g = g_ref[:c1, 0:1]
    bb = b_ref[:c1, 0:1]
    ds2 = ds2_ref[:c2, 0:1]
    dss2 = dss2_ref[:c2, 0:1]
    g2x = jnp.concatenate([g, g], 0)
    b2x = jnp.concatenate([bb, bb], 0)

    def halves(local):
        t = i0 * 2 * R + local - 1
        row = sy[slot, local].astype(jnp.float32)
        a = _silu_f32(row * g2x + b2x)
        ok = jnp.logical_and(t >= 0, t < h2)
        a = jnp.where(ok, a, 0.0).astype(dtype)
        return a[:c1], a[c1:]

    def deff_at(local):
        t = i0 * R + local - 1                           # y2 data row
        d = sdy[slot, local].astype(jnp.float32)
        yo = syo[slot, local].astype(jnp.float32)
        e = d + ds2 + 2.0 * yo * dss2
        ok = jnp.logical_and(t >= 0, t < h4)
        return jnp.where(ok, e, 0.0).astype(dtype)

    # dk2 accumulation over this block's R output rows
    acc = jnp.zeros((9 * c1, c2), jnp.float32)
    for r in range(R):
        tiles = []
        for dy in range(3):
            ae, ao = halves(2 * r + dy)
            tiles.append(_roll_right_masked(ao, w4))
            tiles.append(ae)
            tiles.append(ao)
        xT = jnp.concatenate(tiles, 0)                    # (9c1, W4)
        acc = acc + jax.lax.dot_general(
            xT, deff_at(r + 1), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        dk_ref[...] = acc

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        dk_ref[...] = dk_ref[...] + acc

    # dA1 for this block's 2R input rows: input row t receives from
    # output i = (t+1-dy)/2 when t+1-dy is even (deff local i+1-i0*R);
    # even-half taps are dx=1 of the kernel, odd-half dx=0 (next output,
    # left tap -> right-rolled in fwd) and dx=2.
    kf = kflat_ref[...]                                   # (9c1, c2)
    accg = jnp.zeros((c1, 1), jnp.float32)
    accb = jnp.zeros((c1, 1), jnp.float32)
    for r in range(2 * R):
        d_e = jnp.zeros((c1, w4), jnp.float32)
        d_o = jnp.zeros((c1, w4), jnp.float32)
        for dy in range(3):
            if (r + 1 - dy) % 2 != 0:
                continue
            loc = (r + 1 - dy) // 2 + 1
            if loc < 0 or loc >= sdy.shape[1]:
                continue
            dyr = deff_at(loc)                            # (c2, W4)
            for dx, acc_t in ((0, "o_roll"), (1, "e"), (2, "o")):
                ktap = kf[(dy * 3 + dx) * c1:(dy * 3 + dx + 1) * c1]
                dv = jax.lax.dot_general(
                    ktap.astype(dtype), dyr,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (c1, W4)
                if acc_t == "e":
                    d_e = d_e + dv
                elif acc_t == "o":
                    d_o = d_o + dv
                else:          # fwd right-rolled the odd half
                    d_o = d_o + _roll_left_masked(dv, w4)
        # chain through silu'(z1) * g1; accumulate BN1 partials
        t = i0 * 2 * R + r
        ok = t < h2
        row = sy[slot, r + 1].astype(jnp.float32)         # y1 row t
        yer, yor = row[:c1], row[c1:]
        dpre_e = jnp.where(ok, d_e * _dsilu_f32(yer * g + bb), 0.0)
        dpre_o = jnp.where(ok, d_o * _dsilu_f32(yor * g + bb), 0.0)
        dy1_ref[r] = jnp.concatenate(
            [(dpre_e * g).astype(dy1_ref.dtype),
             (dpre_o * g).astype(dy1_ref.dtype)], 0)
        accg = accg + jnp.sum(dpre_e * yer + dpre_o * yor, 1,
                              keepdims=True)
        accb = accb + jnp.sum(dpre_e + dpre_o, 1, keepdims=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, gacc_ref.shape, 1)
    cp = gacc_ref.shape[0]
    gp = jnp.pad(accg, ((0, cp - c1), (0, 0)))
    bp = jnp.pad(accb, ((0, cp - c1), (0, 0)))
    grows = jnp.where(lane == 0, gp, jnp.where(lane == 1, bp, 0.0))

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        gacc_ref[...] = grows

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        gacc_ref[...] = gacc_ref[...] + grows


def _k1wgrad_kernel(x0_hbm, x1_hbm, x2_hbm, x3_hbm, y1_hbm, dy1_hbm,
                    ds_ref, dss_ref, dk_ref,
                    s0, s1, s2, s3, sy, sd,
                    m0, m1, m2, m3, my, md,
                    *, w4, cin, c1, dtype):
    """dk1 += Xe^T @ deff_e^T + Xo^T @ deff_o^T with deff = dy1_chained +
    ds1 + 2*y1*dss1 (phase-split rows). No input gradient (x is the
    image). y1 is +1-shifted (local r+1), dy1 direct (local r); x phase
    row for output t, tap dy is storage 2t+dy+2, local 2r+dy+2."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(x0_hbm, s0, m0, 2 * R), (x1_hbm, s1, m1, 2 * R),
                  (x2_hbm, s2, m2, 2 * R), (x3_hbm, s3, m3, 2 * R),
                  (y1_hbm, sy, my, R), (dy1_hbm, sd, md, R)],
                 b, i0, pl.num_programs(1)).run()
    ds = ds_ref[:c1, 0:1]
    dss = dss_ref[:c1, 0:1]
    ds2x = jnp.concatenate([ds, ds], 0)
    dss2x = jnp.concatenate([dss, dss], 0)
    acc = jnp.zeros((9 * cin, c1), jnp.float32)
    for r in range(R):
        y1r = sy[slot, r + 1].astype(jnp.float32)         # (2c1, W4)
        dchain = sd[slot, r].astype(jnp.float32)
        deff = (dchain + ds2x + 2.0 * y1r * dss2x).astype(dtype)
        te, to = [], []
        for dy in range(3):
            rows = [s[slot, 2 * r + dy + 2].astype(dtype)
                    for s in (s0, s1, s2, s3)]
            e, o = _phase_tiles(rows, w4, dtype)
            te += e
            to += o
        acc = acc + jax.lax.dot_general(
            jnp.concatenate(te, 0), deff[:c1],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            jnp.concatenate(to, 0), deff[c1:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        dk_ref[...] = acc

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        dk_ref[...] = dk_ref[...] + acc


# ── orchestration ────────────────────────────────────────────────────────

def _front_core(x, k1, sc1, bi1, k2, dtype, use_stats=None):
    """Runs K1 (P1 conv + stats, phase-split output) and K2 (P2 conv on
    silu(bn1) + stats). Returns ((y2, mean1, var1, mean2, var2),
    residuals). use_stats: ((m1, m2), (v1, v2)) for eval."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = x.shape
    c1 = k1.shape[-1]
    c2 = k2.shape[-1]
    h2 = h // 2
    h4, w4 = h2 // 2, w // 4
    nb = h2 // R
    nb4 = h4 // R
    n1 = b * h2 * (w // 2)
    n2 = b * h4 * w4

    phases = _prep4(x, dtype)
    cin_p = phases[0].shape[2]
    k1p = jnp.pad(k1, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))

    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    def bcast(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda bb, ii: (0,) * n)

    def row_out(c, wl):
        return pl.BlockSpec((None, R, c, wl), lambda bb, ii: (bb, ii, 0, 0))

    def stats_spec(c):
        cp = _round8(c)
        return pl.BlockSpec((None, None, cp, 128),
                            lambda bb, ii: (bb, ii, 0, 0))

    def stats_shape(blocks, c):
        cp = _round8(c)
        return jax.ShapeDtypeStruct((b, blocks, cp, 128), jnp.float32)

    # K1: P1 conv + stats1, phase-split (2c1, W4) rows, +1-shifted
    y1, st1 = pl.pallas_call(
        functools.partial(_front1_kernel, w4=w4, cin=cin_p, c1=c1,
                          h2=h2, dtype=dtype),
        grid=(b, nb + 1),
        in_specs=[anyspec] * 4 + [bcast((c1, 9 * cin_p))],
        out_specs=(row_out(2 * c1, w4), stats_spec(c1)),
        out_shape=(jax.ShapeDtypeStruct((b, h2 + R, 2 * c1, w4), dtype),
                   stats_shape(nb + 1, c1)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, cin_p, w4), dtype)] * 4
        + [pltpu.SemaphoreType.DMA((2,))] * 4,
        interpret=_interpret(),
    )(*phases, _kT(k1p, c1))
    if use_stats is None:
        mean1, var1 = _combine_stats(st1, c1, n1)
    else:
        mean1, var1 = use_stats[0][0], use_stats[1][0]
    g1, b1 = _fold_bn(sc1, bi1, mean1, var1)

    # K2: P2 conv on a1 = silu(bn1(y1)) + stats2
    y2, st2 = pl.pallas_call(
        functools.partial(_s2silu_kernel, w4=w4, c1=c1, c2=c2, h2=h2,
                          dtype=dtype),
        grid=(b, nb4),
        in_specs=[anyspec, bcast((c2, 9 * c1)),
                  bcast((c1, 128)), bcast((c1, 128))],
        out_specs=(row_out(c2, w4), stats_spec(c2)),
        out_shape=(jax.ShapeDtypeStruct((b, h4, c2, w4), dtype),
                   stats_shape(nb4, c2)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, 2 * c1, w4), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y1, _kT(k2, c2), _vec_tile(g1), _vec_tile(b1))
    if use_stats is None:
        mean2, var2 = _combine_stats(st2, c2, n2)
    else:
        mean2, var2 = use_stats[0][1], use_stats[1][1]

    out = (y2, mean1, var1, mean2, var2)
    res = (phases, y1, y2, mean1, var1, mean2, var2)
    return out, res


def _front_bwd_impl(dtype, res, params, dy2, dmean1, dvar1, dmean2,
                    dvar2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (phases, y1, y2, mean1, var1, mean2, var2) = res
    (k1, sc1, bi1, k2) = params
    b, hp2, c12, w4 = y1.shape
    c1 = c12 // 2
    c2 = y2.shape[2]
    h2 = hp2 - R
    h4 = h2 // 2
    nb = h2 // R
    nb4 = h4 // R
    cin_p = phases[0].shape[2]
    cin = k1.shape[2]
    n1 = b * h2 * 2 * w4
    n2 = b * h4 * w4

    g1, b1 = _fold_bn(sc1, bi1, mean1, var1)

    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    def bcast(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda bb, ii: (0,) * n)

    def row_out(rows, c, wl):
        return pl.BlockSpec((None, rows, c, wl),
                            lambda bb, ii: (bb, ii, 0, 0))

    def const2(shape):
        return pl.BlockSpec(shape, lambda bb, ii: (0, 0))

    # stats2 cotangent scalars (the full-tensor fold happens IN-KERNEL)
    ds2 = dmean2 / n2 - 2.0 * mean2 * dvar2 / n2
    dss2 = dvar2 / n2
    dy2p = _pad_top(dy2.astype(dtype), h4 + R + 8)
    y2p = _pad_top(y2, h4 + R + 8)

    # K2b: dk2 + chained dy1 (phase-split) + BN1 partials
    c1p = _round8(c1)
    dk2f, dy1, g1acc = pl.pallas_call(
        functools.partial(_s2silu_bwd_kernel, w4=w4, c1=c1, c2=c2,
                          h2=h2, h4=h4, dtype=dtype),
        grid=(b, nb4),
        in_specs=[anyspec, anyspec, anyspec, bcast((9 * c1, c2)),
                  bcast((c1, 128)), bcast((c1, 128)),
                  bcast((c2, 128)), bcast((c2, 128))],
        out_specs=(const2((9 * c1, c2)), row_out(2 * R, 2 * c1, w4),
                   const2((c1p, 128))),
        out_shape=(jax.ShapeDtypeStruct((9 * c1, c2), jnp.float32),
                   jax.ShapeDtypeStruct((b, h2, 2 * c1, w4), dtype),
                   jax.ShapeDtypeStruct((c1p, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, 2 * c1, w4), dtype),
                        pltpu.VMEM((2, 2 * R, c2, w4), dtype),
                        pltpu.VMEM((2, 2 * R, c2, w4), dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y1, dy2p, y2p, k2.reshape(9 * c1, c2), _vec_tile(g1),
      _vec_tile(b1), _vec_tile(ds2), _vec_tile(dss2))

    dsc1, dbi1, ds1, dss1 = _bn_chain(
        g1acc[:c1, 0], g1acc[:c1, 1], sc1, mean1, var1, n1,
        dmean1, dvar1)

    # K1b: P1 weight grad (no input gradient)
    (dk1f,) = pl.pallas_call(
        functools.partial(_k1wgrad_kernel, w4=w4, cin=cin_p, c1=c1,
                          dtype=dtype),
        grid=(b, nb),
        in_specs=[anyspec] * 6 + [bcast((c1, 128)), bcast((c1, 128))],
        out_specs=(const2((9 * cin_p, c1)),),
        out_shape=(jax.ShapeDtypeStruct((9 * cin_p, c1), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 4, cin_p, w4), dtype)] * 4
        + [pltpu.VMEM((2, R + 8, 2 * c1, w4), dtype),
           pltpu.VMEM((2, R, 2 * c1, w4), dtype)]
        + [pltpu.SemaphoreType.DMA((2,))] * 6,
        interpret=_interpret(),
    )(*phases, y1, dy1, _vec_tile(ds1), _vec_tile(dss1))

    dx = jnp.zeros((b, 2 * h2, 8 * w4 // 2, cin), _front_bwd_impl.x_dtype)
    dk1 = dk1f.reshape(3, 3, cin_p, c1)[:, :, :cin].astype(k1.dtype)
    dk2 = dk2f.reshape(3, 3, c1, c2).astype(k2.dtype)
    return (dx, dk1, dsc1.astype(sc1.dtype), dbi1.astype(bi1.dtype), dk2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _front_core_diff(x, k1, sc1, bi1, k2, dtype):
    out, _ = _front_core(x, k1, sc1, bi1, k2, dtype)
    return out


def _front_fwd(x, k1, sc1, bi1, k2, dtype):
    out, res = _front_core(x, k1, sc1, bi1, k2, dtype)
    _front_bwd_impl.x_dtype = x.dtype
    return out, (res, (k1, sc1, bi1, k2))


def _front_bwd(dtype, full_res, cot):
    res, params = full_res
    dy2, dmean1, dvar1, dmean2, dvar2 = cot
    return _front_bwd_impl(dtype, res, params, dy2, dmean1, dvar1,
                           dmean2, dvar2)


_front_core_diff.defvjp(_front_fwd, _front_bwd)


def front_fused(x, k1, sc1, bi1, k2, dtype=jnp.bfloat16):
    """Fused YOLO front (train): (B, H, W, 3) float ->
    (y2_planes_pre_bn2 (B, H/4, c2, W/4), mean1, var1, mean2, var2).

    The caller applies BN2 + SiLU (cheap planes math, autodiff-able) and
    owns the running-stat updates from the returned batch stats."""
    return _front_core_diff(x, k1, sc1, bi1, k2, dtype)


def front_fused_inference(x, k1, sc1, bi1, k2, means, variances,
                          dtype=jnp.bfloat16):
    """Eval-mode fused front: BN1 folds use the provided RUNNING stats.
    Returns y2 planes only (caller applies BN2 from running stats)."""
    (y2, *_), _ = _front_core(x, k1, sc1, bi1, k2, dtype,
                              use_stats=(means, variances))
    return y2


def supported(x_shape, cin=3):
    """True when the fused path handles this input: H mult 32 (window
    blocks at both resolutions), W mult 512 (W/4 stays a lane multiple);
    the production sizes 512/1024/1536 pass."""
    b, h, w, c = x_shape
    return (c == cin and h % 32 == 0 and w % 512 == 0
            and h >= 32 and w >= 512)
