"""Fused Pallas HGStem: the 512-resolution small-channel front of HGNetv2.

WHY. At (8, 1024, 1024, 3) the stem (3x3/2 conv -> [2x2-pool | 2x2-conv x2]
-> concat -> 3x3/2 conv) costs ~38 ms fwd+bwd under XLA on v5e — every
tensor has 3..64 channels, so the NHWC lane dimension is 2..42x padded,
train-mode BatchNorm inserts two full-tensor passes per conv, and the
compiler flip-flops layouts between fusions (device trace: ~6 ms of pure
relayout copies, stem1's conv at 1.3 TFLOP/s / 69 GB/s). Algebraic
reformulations at the XLA level are neutral: the pad/transpose they need
get materialised (measured, STATUS r3).

DESIGN. All intermediates live in a PLANES layout (B, H, C, W) — channel
planes with W in lanes — so every VMEM tile is packed (C is a sublane
multiple for all stem widths except the 3-channel input):

  * a conv tap (dy, dx) is a LANE ROLL (pltpu.roll) of a (C, W) tile with
    the wrapped edge masked, and the patch matrix X^T (taps*C, W) is a
    SUBLANE CONCAT of rolled tiles;
  * the conv is one MXU matmul  y^T (C_out, W) = k^T (C_out, taps*C) @ X^T
    per output row — K = 27/128/64/576 for stem1/2a/2b/3;
  * stride-2 convs (stem1, stem3) read even/odd column-split inputs,
    prepared by XLA as compact planes tensors (one strided copy each);
  * train-mode BatchNorm is DEFERRED: each kernel emits per-block partial
    (sum, sum-of-squares) rows; XLA reduces them to mean/var (tiny (C,)
    math) and the NEXT kernel applies the previous BN + ReLU on the fly
    as folded (g, b) vectors while reading. No full-tensor normalize
    passes exist anywhere.
  * row blocks move HBM->VMEM with the halo-window DMA pattern of
    ops/pallas_corrupt.py (grid steps run sequentially per core).

The public entry is :func:`stem_fused`; models/rtdetr.HGStem routes to it
on TPU for supported shapes. The backward mirrors the forward: conv-
transpose taps are the same rolls with flipped kernels, dW is one MXU
matmul per row accumulated across the grid, and the BN backward's
full-tensor terms (dy += ds + 2 y dss, relu masks, g scaling) are folded
into the kernels that already stream those tensors.

Parity contract: semantics match the XLA HGStem path (flax BatchNorm
momentum 0.97 / eps 1e-3, ceil-pool via shifted maxima, concat order
[pool, conv]) up to bf16/f32 accumulation order; tests/test_pallas_stem.py
asserts value + grad parity against the flax module in interpret mode
(CPU) and the integration test covers the TPU path.

Reference counterpart: Ultralytics HGStem (nn.Conv2d+BN+ReLU stack) —
SURVEY.md §2.2 RT-DETR-L capability row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

R = 8              # output rows per grid step (on each kernel's out grid)
_INTERPRET = False  # tests flip to run kernels on CPU

EPS = 1e-3         # flax BatchNorm epsilon used by every stem BN


def _interpret():
    return _INTERPRET or jax.default_backend() != "tpu"


def _round8(n):
    return -(-n // 8) * 8


# ── in-kernel helpers ────────────────────────────────────────────────────

def _roll_left_masked(v, w):
    """v (C, W): v'[:, j] = v[:, j+1], zero at j = W-1 (not circular)."""
    from jax.experimental.pallas import tpu as pltpu
    if _interpret():
        rolled = jnp.roll(v, -1, axis=-1)
    else:
        # Mosaic's rotate handles 32-bit lanes only -> roll in f32
        rolled = pltpu.roll(v.astype(jnp.float32), w - 1, 1).astype(v.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == w - 1, jnp.zeros_like(v), rolled)


def _roll_right_masked(v, w):
    """v (C, W): v'[:, j] = v[:, j-1], zero at j = 0 (not circular)."""
    from jax.experimental.pallas import tpu as pltpu
    if _interpret():
        rolled = jnp.roll(v, 1, axis=-1)
    else:
        rolled = pltpu.roll(v.astype(jnp.float32), 1, 1).astype(v.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == 0, jnp.zeros_like(v), rolled)


def _stats_rows(acc_s, acc_ss, cp):
    """Pack two (C, 1) f32 accumulators into a (cp, 128) stats tile:
    channels in sublanes, lane 0 = sum, lane 1 = sum of squares."""
    c = acc_s.shape[0]
    sp = jnp.pad(acc_s, ((0, cp - c), (0, 0)))
    ssp = jnp.pad(acc_ss, ((0, cp - c), (0, 0)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (cp, 128), 1)
    return jnp.where(lane == 0, sp, jnp.where(lane == 1, ssp, 0.0))


def _acc_stats(acc_s, acc_ss, y):
    yf = y.astype(jnp.float32)
    acc_s = acc_s + jnp.sum(yf, 1, keepdims=True)
    acc_ss = acc_ss + jnp.sum(yf * yf, 1, keepdims=True)
    return acc_s, acc_ss


def _dma(hbm_ref, b, row0, scratch, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.make_async_copy(
        hbm_ref.at[b, pl.ds(row0, scratch.shape[0])], scratch, sem)


class _DBuf:
    """Double-buffered halo windows over a sequential (B, NB[+1]) grid.

    srcs: list of (hbm_ref, scratch (2, rows, C, W), sem (2,), stride)
    — the window for data block (bs, is) covers rows [is*stride,
    is*stride + rows). Data blocks are i0 < nb; an optional trailing
    zero-pad block (i0 == nb) is skipped by the data-step indexing, so
    the block before it prefetches the NEXT BATCH's first window
    (grid steps run sequentially per core)."""

    def __init__(self, srcs, b, i0, nb):
        from jax.experimental import pallas as pl
        self.srcs = srcs
        self.nb = nb
        self.i0 = i0
        self.d = b * nb + i0
        self.total = pl.num_programs(0) * nb

    def _start(self, d, slot):
        bs = d // self.nb
        is_ = d % self.nb
        for hbm, scr, sem, stride in self.srcs:
            _dma(hbm, bs, is_ * stride, scr.at[slot], sem.at[slot]).start()

    def run(self):
        """Issue step-0 + next-step DMAs, wait for this step's; returns
        the scratch slot index for this data block."""
        from jax.experimental import pallas as pl
        d, nb, i0 = self.d, self.nb, self.i0

        @pl.when(jnp.logical_and(d == 0, i0 < nb))
        def _():
            self._start(0, 0)

        @pl.when(jnp.logical_and(i0 < nb, d + 1 < self.total))
        def _():
            self._start(d + 1, (d + 1) % 2)

        slot = d % 2

        @pl.when(i0 < nb)
        def _():
            bs = d // nb
            is_ = d % nb
            for hbm, scr, sem, stride in self.srcs:
                _dma(hbm, bs, is_ * stride, scr.at[slot],
                     sem.at[slot]).wait()
        return slot


# ── forward kernels ──────────────────────────────────────────────────────

def _stem1_kernel(xe_hbm, xo_hbm, kT_ref, y_ref, stats_ref,
                  se, so, sem_e, sem_o, *, w2, cin, cm, dtype):
    """stem1 3x3/2 conv. Output rows [i0*R, i0*R+R); input rows 2i+dy in
    +1-shifted storage. Patch order (dy, dx, c): dx=0 -> right-rolled odd,
    dx=1 -> even, dx=2 -> odd. Grid (B, nb+1): last block writes the
    zero pad rows consumed by the next kernel's bottom halo."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    nb = pl.num_programs(1) - 1

    @pl.when(i0 == nb)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)
        stats_ref[...] = jnp.zeros_like(stats_ref)

    slot = _DBuf([(xe_hbm, se, sem_e, 2 * R), (xo_hbm, so, sem_o, 2 * R)],
                 b, i0, nb).run()

    @pl.when(i0 < nb)
    def _():
        kT = kT_ref[...].astype(dtype)                   # (cm, 9*cin)
        acc_s = jnp.zeros((cm, 1), jnp.float32)
        acc_ss = jnp.zeros((cm, 1), jnp.float32)
        for r in range(R):
            tiles = []
            for dy in range(3):
                xer = se[slot, 2 * r + dy].astype(dtype)  # (cin, W2)
                xor = so[slot, 2 * r + dy].astype(dtype)
                tiles.append(_roll_right_masked(xor, w2))
                tiles.append(xer)
                tiles.append(xor)
            xT = jnp.concatenate(tiles, 0)               # (9*cin, W2)
            y = jax.lax.dot_general(
                kT, xT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (cm, W2)
            yc = y.astype(y_ref.dtype)
            y_ref[r] = yc
            acc_s, acc_ss = _acc_stats(acc_s, acc_ss, yc)
        stats_ref[...] = _stats_rows(acc_s, acc_ss, stats_ref.shape[0])


def _conv2x2_kernel(y_hbm, kT_ref, g_ref, b_ref, o_ref, stats_ref,
                    sc, sem, *, w2, cin, cout, h2, dtype):
    """2x2 pad-right/bottom conv on a = relu(g*y + b), planes layout.
    Patch order (dy, dx, c): [row i | row i left-rolled | row i+1 | row
    i+1 left-rolled]."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    nb = pl.num_programs(1) - 1

    @pl.when(i0 == nb)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        stats_ref[...] = jnp.zeros_like(stats_ref)

    slot = _DBuf([(y_hbm, sc, sem, R)], b, i0, nb).run()

    @pl.when(i0 < nb)
    def _():
        kT = kT_ref[...].astype(dtype)                   # (cout, 4*cin)
        g = g_ref[:cin, 0:1]
        bb = b_ref[:cin, 0:1]
        acc_s = jnp.zeros((cout, 1), jnp.float32)
        acc_ss = jnp.zeros((cout, 1), jnp.float32)

        def a_row(r):
            # the conv's bottom pad is zero AFTER bn+relu: a zero y row
            # must not become relu(b) (reference pads a1, not y1)
            y = sc[slot, r].astype(jnp.float32)          # (cin, W2)
            a = jnp.maximum(y * g + bb, 0.0)
            return jnp.where(i0 * R + r < h2, a, 0.0).astype(dtype)

        a_prev = a_row(0)
        for r in range(R):
            a0 = a_prev
            a1 = a_row(r + 1)
            a_prev = a1
            xT = jnp.concatenate(
                [a0, _roll_left_masked(a0, w2),
                 a1, _roll_left_masked(a1, w2)], 0)      # (4*cin, W2)
            y = jax.lax.dot_general(
                kT, xT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (cout, W2)
            yc = y.astype(o_ref.dtype)
            o_ref[r] = yc
            acc_s, acc_ss = _acc_stats(acc_s, acc_ss, yc)
        stats_ref[...] = _stats_rows(acc_s, acc_ss, stats_ref.shape[0])


def _assemble_kernel(y1_hbm, y2b_hbm, g1_ref, b1_ref, g2_ref, b2_ref,
                     o_ref, s1c, s2c, sem1, sem2, *, w2, cm, h2, dtype):
    """concat planes [pool(a1) | a2b] per row; pool = ceil 2x2/1 max."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    nb = pl.num_programs(1) - 1

    @pl.when(i0 == nb)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    slot = _DBuf([(y1_hbm, s1c, sem1, R), (y2b_hbm, s2c, sem2, R)],
                 b, i0, nb).run()

    @pl.when(i0 < nb)
    def _():
        g1 = g1_ref[:cm, 0:1]
        b1 = b1_ref[:cm, 0:1]
        g2 = g2_ref[:cm, 0:1]
        b2 = b2_ref[:cm, 0:1]

        def a1_row(r):
            y = s1c[slot, r].astype(jnp.float32)
            a = jnp.maximum(y * g1 + b1, 0.0)
            return jnp.where(i0 * R + r < h2, a, 0.0)

        a_prev = a1_row(0)
        for r in range(R):
            a0 = a_prev
            a1 = a1_row(r + 1)
            a_prev = a1
            pool = jnp.maximum(
                jnp.maximum(a0, _roll_left_masked(a0, w2)),
                jnp.maximum(a1, _roll_left_masked(a1, w2)))
            y2 = s2c[slot, r].astype(jnp.float32)
            a2b = jnp.maximum(y2 * g2 + b2, 0.0)
            o_ref[r] = jnp.concatenate(
                [pool.astype(o_ref.dtype), a2b.astype(o_ref.dtype)], 0)


def _stem3_kernel(ce_hbm, co_hbm, kT_ref, o_ref, stats_ref,
                  se, so, sem_e, sem_o, *, w4, cc, cout, dtype):
    """3x3/2 conv on the cc-channel concat, even/odd split input (same
    structure as stem1)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(ce_hbm, se, sem_e, 2 * R), (co_hbm, so, sem_o, 2 * R)],
                 b, i0, pl.num_programs(1)).run()
    kT = kT_ref[...].astype(dtype)                       # (cout, 9*cc)
    acc_s = jnp.zeros((cout, 1), jnp.float32)
    acc_ss = jnp.zeros((cout, 1), jnp.float32)
    for r in range(R):
        tiles = []
        for dy in range(3):
            er = se[slot, 2 * r + dy].astype(dtype)      # (cc, W4)
            orr = so[slot, 2 * r + dy].astype(dtype)
            tiles.append(_roll_right_masked(orr, w4))
            tiles.append(er)
            tiles.append(orr)
        xT = jnp.concatenate(tiles, 0)                   # (9*cc, W4)
        y = jax.lax.dot_general(
            kT, xT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (cout, W4)
        yc = y.astype(o_ref.dtype)
        o_ref[r] = yc
        acc_s, acc_ss = _acc_stats(acc_s, acc_ss, yc)
    stats_ref[...] = _stats_rows(acc_s, acc_ss, stats_ref.shape[0])


# ── XLA-side glue ────────────────────────────────────────────────────────

def _prep_input(x, dtype):
    """(B, H, W, 3) -> xe, xo planes (B, HP, 4, W2), +1-row-shifted with
    zero SAME-pad rows; xo lane j = input column 2j+1. The channel dim
    pads 3 -> 4 (bf16 sublane tiling needs 4-aligned DMA slices); the
    zero plane is matched by a zero kernel column, so it contributes
    nothing."""
    b, h, w, cin = x.shape
    w2 = w // 2
    hp = _round8(h + 2)
    xp = x.astype(dtype)
    xe = xp[:, :, 0::2, :].transpose(0, 1, 3, 2)         # (B, H, 3, W2)
    xo = xp[:, :, 1::2, :].transpose(0, 1, 3, 2)
    pad = ((0, 0), (1, hp - h - 1), (0, _round4(cin) - cin), (0, 0))
    return jnp.pad(xe, pad), jnp.pad(xo, pad)


def _round4(n):
    return -(-n // 4) * 4


def _split_even_odd(cat, h2):
    """cat (B, HP2, cc, W2) -> ce, co (B, HS, cc, W4), +1-row-shifted."""
    b, _, cc, w2 = cat.shape
    w4 = w2 // 2
    hs = _round8(h2 + 2 + 2 * R)     # stem3 windows read 2R+2 from 2i
    ce = cat[:, :h2, :, 0::2]
    co = cat[:, :h2, :, 1::2]
    pad = ((0, 0), (1, hs - h2 - 1), (0, 0), (0, 0))
    return jnp.pad(ce, pad), jnp.pad(co, pad)


def _combine_stats(parts, c, n):
    s = parts[:, :, :c, 0].sum((0, 1))
    ss = parts[:, :, :c, 1].sum((0, 1))
    mean = s / n
    # fast-variance clamp, matching flax _compute_stats
    var = jnp.maximum(0.0, ss / n - mean * mean)
    return mean, var


def _fold_bn(scale, bias, mean, var):
    g = scale.astype(jnp.float32) * jax.lax.rsqrt(var + EPS)
    return g, bias.astype(jnp.float32) - mean * g


def _vec_tile(v):
    """(C,) f32 -> (C8, 128) tile: channels in sublanes, lane-broadcast."""
    c8 = _round8(v.shape[0])
    p = jnp.pad(v.astype(jnp.float32), (0, c8 - v.shape[0]))
    return jnp.broadcast_to(p[:, None], (c8, 128))


def _kT(k, cout):
    """(kh, kw, cin, cout) -> (cout, kh*kw*cin) row-major (dy, dx, c)."""
    return k.reshape(-1, cout).T


# ── forward orchestration ────────────────────────────────────────────────

def stem_fused(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b,
               k3, dtype=jnp.bfloat16):
    """Fused HGStem front: (B, H, W, 3) float in [0,1] ->
    (y3_nhwc_pre_bn3 (B, H/4, W/4, co3), means (4-tuple), vars (4-tuple)).

    The caller applies BN3 + ReLU and stem4 (cheap at H/4 resolution) and
    owns the running-stat updates from the returned batch means/vars.
    Requires H mult of 16 and W mult of 256 (gate + fall back to the XLA
    modules otherwise)."""
    y3, means, variances = _stem_core_diff(
        x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b, k3, dtype)
    b, h, w, _ = x.shape
    h4, w4 = h // 4, w // 4
    co3 = k3.shape[-1]
    y3 = y3[:, :h4].transpose(0, 1, 3, 2)                # NHWC
    return y3, means, variances


def _stem_core(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b,
               k3, dtype, use_stats=None):
    """use_stats: optional (means, vars) 4-tuples — eval mode folds the
    BN scales from RUNNING stats instead of the batch stats (the batch
    stats outputs then carry the provided values)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = x.shape
    cm = k2b.shape[-1]                       # 32
    ch = cm // 2                             # 16
    cc = 2 * cm                              # 64
    co3 = k3.shape[-1]                       # 32
    h2, w2 = h // 2, w // 2
    h4, w4 = h2 // 2, w2 // 2
    nb = h2 // R
    nb4 = h4 // R
    hp2 = h2 + R                             # data + one zero pad block
    n1 = b * h2 * w2
    n3 = b * h4 * w4

    xe, xo = _prep_input(x, dtype)
    cin_p = xe.shape[2]
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

    # K1: stem1 conv + stats1
    y1, st1 = pl.pallas_call(
        functools.partial(_stem1_kernel, w2=w2, cin=cin_p, cm=cm,
                          dtype=dtype),
        grid=(b, nb + 1),
        in_specs=[anyspec, anyspec, bcast((cm, 9 * cin_p))],
        out_specs=(row_out(cm, w2), stats_spec(cm)),
        out_shape=(jax.ShapeDtypeStruct((b, hp2, cm, w2), dtype),
                   stats_shape(nb + 1, cm)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, cin_p, w2), dtype),
                        pltpu.VMEM((2, 2 * R + 2, cin_p, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(xe, xo, _kT(k1p, cm))
    if use_stats is None:
        mean1, var1 = _combine_stats(st1, cm, n1)
    else:
        mean1, var1 = use_stats[0][0], use_stats[1][0]
    g1, b1 = _fold_bn(sc1, bi1, mean1, var1)

    # K2: stem2a on a1 = relu(bn1(y1))
    y2a, st2a = pl.pallas_call(
        functools.partial(_conv2x2_kernel, w2=w2, cin=cm, cout=ch,
                          h2=h2, dtype=dtype),
        grid=(b, nb + 1),
        in_specs=[anyspec, bcast((ch, 4 * cm)), bcast((cm, 128)),
                  bcast((cm, 128))],
        out_specs=(row_out(ch, w2), stats_spec(ch)),
        out_shape=(jax.ShapeDtypeStruct((b, hp2, ch, w2), dtype),
                   stats_shape(nb + 1, ch)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R, cm, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y1, _kT(k2a, ch), _vec_tile(g1), _vec_tile(b1))
    if use_stats is None:
        mean2a, var2a = _combine_stats(st2a, ch, n1)
    else:
        mean2a, var2a = use_stats[0][1], use_stats[1][1]
    g2a, b2a = _fold_bn(sc2a, bi2a, mean2a, var2a)

    # K3: stem2b on a2a
    y2b, st2b = pl.pallas_call(
        functools.partial(_conv2x2_kernel, w2=w2, cin=ch, cout=cm,
                          h2=h2, dtype=dtype),
        grid=(b, nb + 1),
        in_specs=[anyspec, bcast((cm, 4 * ch)), bcast((ch, 128)),
                  bcast((ch, 128))],
        out_specs=(row_out(cm, w2), stats_spec(cm)),
        out_shape=(jax.ShapeDtypeStruct((b, hp2, cm, w2), dtype),
                   stats_shape(nb + 1, cm)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R, ch, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y2a, _kT(k2b, cm), _vec_tile(g2a), _vec_tile(b2a))
    if use_stats is None:
        mean2b, var2b = _combine_stats(st2b, cm, n1)
    else:
        mean2b, var2b = use_stats[0][2], use_stats[1][2]
    g2b, b2b = _fold_bn(sc2b, bi2b, mean2b, var2b)

    # K4: concat [pool(a1) | a2b]
    (cat,) = pl.pallas_call(
        functools.partial(_assemble_kernel, w2=w2, cm=cm, h2=h2,
                          dtype=dtype),
        grid=(b, nb + 1),
        in_specs=[anyspec, anyspec, bcast((cm, 128)), bcast((cm, 128)),
                  bcast((cm, 128)), bcast((cm, 128))],
        out_specs=(row_out(cc, w2),),
        out_shape=(jax.ShapeDtypeStruct((b, hp2, cc, w2), dtype),),
        scratch_shapes=[pltpu.VMEM((2, 2 * R, cm, w2), dtype),
                        pltpu.VMEM((2, 2 * R, cm, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y1, y2b, _vec_tile(g1), _vec_tile(b1), _vec_tile(g2b),
      _vec_tile(b2b))

    ce, co = _split_even_odd(cat, h2)

    # K5: stem3 conv + stats3
    y3, st3 = pl.pallas_call(
        functools.partial(_stem3_kernel, w4=w4, cc=cc, cout=co3,
                          dtype=dtype),
        grid=(b, nb4),
        in_specs=[anyspec, anyspec, bcast((co3, 9 * cc))],
        out_specs=(row_out(co3, w4), stats_spec(co3)),
        out_shape=(jax.ShapeDtypeStruct((b, h4, co3, w4), dtype),
                   stats_shape(nb4, co3)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, cc, w4), dtype),
                        pltpu.VMEM((2, 2 * R + 2, cc, w4), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(ce, co, _kT(k3, co3))
    if use_stats is None:
        mean3, var3 = _combine_stats(st3, co3, n3)
    else:
        mean3, var3 = use_stats[0][3], use_stats[1][3]

    _stem_core.debug = dict(xe=xe, xo=xo, y1=y1, y2a=y2a, y2b=y2b,
                            cat=cat, ce=ce, co=co, g1=g1, b1=b1)
    means = (mean1, mean2a, mean2b, mean3)
    variances = (var1, var2a, var2b, var3)
    res = (xe, xo, y1, y2a, y2b, ce, co, y3, means, variances)
    return (y3, means, variances), res


def supported(x_shape, cin=3, cm=32):
    """True when the fused path handles this input (H mult 16, W mult 256
    keeps every lane slice tile-aligned; production sizes 512-1536 pass).

    w >= 512: at w == 256 the stride-2 stages leave a 64-lane slice
    (Mosaic requires dim-3 slices 128-aligned — verified failing on
    v5e); the XLA fallback handles small inputs."""
    b, h, w, c = x_shape
    return (c == cin and h % (4 * R * 2) == 0 and w % 256 == 0
            and h >= 64 and w >= 512)


# ── backward kernels ─────────────────────────────────────────────────────
#
# The backward mirrors the forward in planes layout. Conventions:
#   * "+1-shifted" tensors (suffix p) store data row t at storage row t+1
#     with zero rows above/below, so every halo window start stays
#     8-aligned and out-of-range taps read zeros;
#   * dk accumulators are constant-index output blocks revisited by every
#     grid step (init at step (0, 0), += after) — the grid is sequential;
#   * dg/db accumulators are (C8, 128) f32 tiles: lane 0 = dg, lane 1 = db;
#   * pool max ties split 0.5/0.5, matching jnp.maximum's VJP; relu's
#     derivative at exactly 0 is 0, matching jax.nn.relu.


def _sel(u, v):
    """maximum-VJP weight of u against v: 1 if u>v, 0.5 at ties, else 0."""
    return jnp.where(u > v, 1.0, jnp.where(u == v, 0.5, 0.0))


def _gdb_rows(acc_g, acc_b, cp):
    c = acc_g.shape[0]
    gp = jnp.pad(acc_g, ((0, cp - c), (0, 0)))
    bp = jnp.pad(acc_b, ((0, cp - c), (0, 0)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (cp, 128), 1)
    return jnp.where(lane == 0, gp, jnp.where(lane == 1, bp, 0.0))


def _stem3_bwd_kernel(ce_hbm, co_hbm, dy3p_hbm, kflat_ref,
                      dk_ref, dce_ref, dco_ref,
                      se, so, sdy, sem_e, sem_o, sem_d,
                      *, w4, cc, co3, dtype):
    """dk3 += X^T @ dy3_eff^T per output row; dce/dco via gather-form
    conv-transpose (parity-static taps). Blocks: 2R concat rows / R output
    rows; dy3p is +1-shifted with a zero row at h4+1."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(ce_hbm, se, sem_e, 2 * R), (co_hbm, so, sem_o, 2 * R),
                  (dy3p_hbm, sdy, sem_d, R)],
                 b, i0, pl.num_programs(1)).run()

    # dk3 accumulation over this block's R output rows
    acc = jnp.zeros((9 * cc, co3), jnp.float32)
    for r in range(R):
        tiles = []
        for dy in range(3):
            er = se[slot, 2 * r + dy].astype(dtype)
            orr = so[slot, 2 * r + dy].astype(dtype)
            tiles.append(_roll_right_masked(orr, w4))
            tiles.append(er)
            tiles.append(orr)
        xT = jnp.concatenate(tiles, 0)                    # (9cc, W4)
        dyr = sdy[slot, r + 1].astype(dtype)              # (co3, W4)
        acc = acc + jax.lax.dot_general(
            xT, dyr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        dk_ref[...] = acc

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        dk_ref[...] = dk_ref[...] + acc

    # dce/dco for this block's 2R concat rows; concat row t gets from
    # output i = (t+1-dy)/2 when t+1-dy is even (dy3p row i+1, local
    # (r+1-dy)//2 + 1); the h4+1 zero row absorbs the bottom edge.
    kf = kflat_ref[...]                                   # (9cc, co3)
    for r in range(2 * R):
        d_e = jnp.zeros((cc, w4), jnp.float32)
        d_o = jnp.zeros((cc, w4), jnp.float32)
        for dy in range(3):
            if (r + 1 - dy) % 2 != 0:
                continue
            loc = (r + 1 - dy) // 2 + 1
            if loc < 0 or loc >= sdy.shape[1]:
                continue
            dyr = sdy[slot, loc].astype(dtype)            # (co3, W4)
            for dx, acc_t in ((0, "o_roll"), (1, "e"), (2, "o")):
                ktap = kf[(dy * 3 + dx) * cc:(dy * 3 + dx + 1) * cc]
                dv = jax.lax.dot_general(
                    ktap.astype(dtype), dyr,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (cc, W4)
                if acc_t == "e":
                    d_e = d_e + dv
                elif acc_t == "o":
                    d_o = d_o + dv
                else:          # fwd right-rolled the odd planes
                    d_o = d_o + _roll_left_masked(dv, w4)
        dce_ref[r] = d_e.astype(dce_ref.dtype)
        dco_ref[r] = d_o.astype(dco_ref.dtype)


def _assemble_bwd_kernel(y1p_hbm, y2b_hbm, dcatp_hbm,
                         g1_ref, b1_ref, g2_ref, b2_ref,
                         da1_ref, dy2b_ref, g2acc_ref, g1acc_ref,
                         s1, s2, sdc, sem1, sem2, sem3,
                         *, w2, cm, h2, dtype):
    """Pool + a2b backward. da1[t] = routed pool grads (max-VJP with 0.5
    ties); dy2b_chain[t] = dcat_a2b[t] * relu'(a2b) * g2b; dg/db partials
    for bn2b and bn1(pool path)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(y1p_hbm, s1, sem1, R), (y2b_hbm, s2, sem2, R),
                  (dcatp_hbm, sdc, sem3, R)],
                 b, i0, pl.num_programs(1)).run()

    g1 = g1_ref[:cm, 0:1]
    b1 = b1_ref[:cm, 0:1]
    g2 = g2_ref[:cm, 0:1]
    b2 = b2_ref[:cm, 0:1]
    t0 = i0 * R

    def a1_at(local_s, t):
        y = s1[slot, local_s].astype(jnp.float32)
        a = jnp.maximum(y * g1 + b1, 0.0)
        return jnp.where(jnp.logical_and(t >= 0, t < h2), a, 0.0)

    accg2 = jnp.zeros((cm, 1), jnp.float32)
    accb2 = jnp.zeros((cm, 1), jnp.float32)
    accg1 = jnp.zeros((cm, 1), jnp.float32)
    accb1 = jnp.zeros((cm, 1), jnp.float32)
    for r in range(R):
        t = t0 + r
        # a1 rows t-1, t, t+1 (y1p local r, r+1, r+2)
        am = a1_at(r, t - 1)
        a0 = a1_at(r + 1, t)
        ap = a1_at(r + 2, t + 1)
        ram = _roll_left_masked(am, w2)
        ra0 = _roll_left_masked(a0, w2)
        rap = _roll_left_masked(ap, w2)
        # pool grads: pool row p = max(max(A0,rA0), max(A1,rA1)) with
        # A0 = a1[p], A1 = a1[p+1]; da1[t] gets A0-role from p=t and
        # A1-role from p=t-1. dcatp local p+1.
        dp0 = sdc[slot, r + 1][:cm].astype(jnp.float32)   # dpool row t
        dpm = sdc[slot, r][:cm].astype(jnp.float32)       # dpool row t-1
        # p = t: operands (a0, ra0, ap, rap)
        top = jnp.maximum(a0, ra0)
        bot = jnp.maximum(ap, rap)
        wt = _sel(top, bot)
        gA0 = wt * _sel(a0, ra0)
        gra0 = wt * _sel(ra0, a0)
        # p = t-1: operands (am, ram, a0, ra0)
        topm = jnp.maximum(am, ram)
        botm = jnp.maximum(a0, ra0)
        wbm = _sel(botm, topm)
        gA1 = wbm * _sel(a0, ra0)
        gra1 = wbm * _sel(ra0, a0)
        da1 = (dp0 * gA0 + _roll_right_masked(dp0 * gra0, w2)
               + dpm * gA1 + _roll_right_masked(dpm * gra1, w2))
        da1_ref[r] = da1.astype(da1_ref.dtype)
        # bn1 partials through the pool path
        y1r = s1[slot, r + 1].astype(jnp.float32)         # y1 row t
        m1 = (y1r * g1 + b1) > 0
        dpre1 = da1 * m1
        accg1 = accg1 + jnp.sum(dpre1 * y1r, 1, keepdims=True)
        accb1 = accb1 + jnp.sum(dpre1, 1, keepdims=True)
        # a2b half
        da2b = sdc[slot, r + 1][cm:].astype(jnp.float32)
        y2r = s2[slot, r].astype(jnp.float32)
        m2 = (y2r * g2 + b2) > 0
        dpre2 = da2b * m2
        dy2b_ref[r] = (dpre2 * g2).astype(dy2b_ref.dtype)
        accg2 = accg2 + jnp.sum(dpre2 * y2r, 1, keepdims=True)
        accb2 = accb2 + jnp.sum(dpre2, 1, keepdims=True)

    g2rows = _gdb_rows(accg2, accb2, g2acc_ref.shape[0])
    g1rows = _gdb_rows(accg1, accb1, g1acc_ref.shape[0])

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        g2acc_ref[...] = g2rows
        g1acc_ref[...] = g1rows

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        g2acc_ref[...] = g2acc_ref[...] + g2rows
        g1acc_ref[...] = g1acc_ref[...] + g1rows


def _conv2x2_bwd_kernel(yin_hbm, dyp_hbm, youtp_hbm, kflat_ref,
                        g_ref, b_ref, ds_ref, dss_ref,
                        dk_ref, dprev_ref, gacc_ref,
                        sin, sdy, syo, sem1, sem2, sem3,
                        *, w2, cin, cout, h2, chain, dtype):
    """Shared backward for stem2a/stem2b (2x2 pad-right/bottom conv on
    a = relu(g*yin + b)).

    dyp/youtp: +1-shifted d(out)-chain and out tensors; the effective
    cotangent folds the BN stats terms in-stream:
        deff(i) = dy_chain(i) + ds + 2*yout(i)*dss     (rows in [0, h2))
    Emits: dk (4cin, cout) grid-accumulated; dprev (R, cin, w2) rows =
    conv-transpose of deff [times relu'(a)*g when chain else raw]; dg/db
    partials for THIS conv's input BN."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(yin_hbm, sin, sem1, R), (dyp_hbm, sdy, sem2, R),
                  (youtp_hbm, syo, sem3, R)],
                 b, i0, pl.num_programs(1)).run()

    g = g_ref[:cin, 0:1]
    bb = b_ref[:cin, 0:1]
    ds = ds_ref[:cout, 0:1]
    dss = dss_ref[:cout, 0:1]
    kf = kflat_ref[...]                                    # (4cin, cout)
    t0 = i0 * R

    def a_at(local_s, t):
        y = sin[slot, local_s].astype(jnp.float32)
        a = jnp.maximum(y * g + bb, 0.0)
        return jnp.where(jnp.logical_and(t >= 0, t < h2),
                         a, 0.0).astype(dtype)

    def deff_at(local_s, t):
        d = sdy[slot, local_s].astype(jnp.float32)
        yo = syo[slot, local_s].astype(jnp.float32)
        e = d + ds + 2.0 * yo * dss
        return jnp.where(jnp.logical_and(t >= 0, t < h2),
                         e, 0.0).astype(dtype)

    acc = jnp.zeros((4 * cin, cout), jnp.float32)
    accg = jnp.zeros((cin, 1), jnp.float32)
    accb = jnp.zeros((cin, 1), jnp.float32)
    for r in range(R):
        t = t0 + r
        # weight grad at output row t: patches a rows t, t+1
        a0 = a_at(r, t)
        a1 = a_at(r + 1, t + 1)
        xT = jnp.concatenate(
            [a0, _roll_left_masked(a0, w2),
             a1, _roll_left_masked(a1, w2)], 0)           # (4cin, W2)
        de_t = deff_at(r + 1, t)                          # (cout, W2)
        acc = acc + jax.lax.dot_general(
            xT, de_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # data grad at input row t: from outputs t (dy=0) and t-1 (dy=1)
        dpre = jnp.zeros((cin, w2), jnp.float32)
        for dy in (0, 1):
            de = de_t if dy == 0 else deff_at(r, t - 1)
            k0 = kf[dy * 2 * cin:(dy * 2 + 1) * cin]       # dx = 0
            k1 = kf[(dy * 2 + 1) * cin:(dy * 2 + 2) * cin]  # dx = 1
            dpre = dpre + jax.lax.dot_general(
                k0.astype(dtype), de, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dpre = dpre + _roll_right_masked(jax.lax.dot_general(
                k1.astype(dtype), de, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), w2)
        yinr = sin[slot, r].astype(jnp.float32)
        mask = (yinr * g + bb) > 0
        if chain:
            dprev_ref[r] = (dpre * mask * g).astype(dprev_ref.dtype)
        else:
            dprev_ref[r] = dpre.astype(dprev_ref.dtype)
        dmask = dpre * mask
        accg = accg + jnp.sum(dmask * yinr, 1, keepdims=True)
        accb = accb + jnp.sum(dmask, 1, keepdims=True)

    grows = _gdb_rows(accg, accb, gacc_ref.shape[0])

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        dk_ref[...] = acc
        gacc_ref[...] = grows

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        dk_ref[...] = dk_ref[...] + acc
        gacc_ref[...] = gacc_ref[...] + grows


def _stem1_bwd_kernel(xe_hbm, xo_hbm, y1_hbm, da1p_hbm, da1k_hbm,
                      g_ref, b_ref, ds_ref, dss_ref, dk_ref,
                      se, so, sy, sp, sk, sem_e, sem_o, sem_y,
                      sem_p, sem_k, *, w2, cin, cm, dtype):
    """dk1 += X^T @ dy1_eff^T with dy1_eff = (da1_pool + da1_K2) *
    relu'(a1) * g1 + ds1 + 2*y1*dss1. No input gradient (x is the image)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    i0 = pl.program_id(1)
    slot = _DBuf([(xe_hbm, se, sem_e, 2 * R), (xo_hbm, so, sem_o, 2 * R),
                  (y1_hbm, sy, sem_y, R), (da1p_hbm, sp, sem_p, R),
                  (da1k_hbm, sk, sem_k, R)],
                 b, i0, pl.num_programs(1)).run()

    g = g_ref[:cm, 0:1]
    bb = b_ref[:cm, 0:1]
    ds = ds_ref[:cm, 0:1]
    dss = dss_ref[:cm, 0:1]
    acc = jnp.zeros((9 * cin, cm), jnp.float32)
    for r in range(R):
        y1r = sy[slot, r].astype(jnp.float32)
        da1 = (sp[slot, r].astype(jnp.float32)
               + sk[slot, r].astype(jnp.float32))
        mask = (y1r * g + bb) > 0
        deff = (da1 * mask * g + ds + 2.0 * y1r * dss).astype(dtype)
        tiles = []
        for dy in range(3):
            xer = se[slot, 2 * r + dy].astype(dtype)
            xor = so[slot, 2 * r + dy].astype(dtype)
            tiles.append(_roll_right_masked(xor, w2))
            tiles.append(xer)
            tiles.append(xor)
        xT = jnp.concatenate(tiles, 0)
        acc = acc + jax.lax.dot_general(
            xT, deff, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == 0, i0 == 0))
    def _():
        dk_ref[...] = acc

    @pl.when(jnp.logical_or(b > 0, i0 > 0))
    def _():
        dk_ref[...] = dk_ref[...] + acc


# ── backward orchestration ───────────────────────────────────────────────

def _pad_top(t, rows):
    """(B, H, C, W) -> top zero row + zero-pad to `rows` total rows."""
    b, h, c, w = t.shape
    return jnp.pad(t, ((0, 0), (1, rows - h - 1), (0, 0), (0, 0)))


def _bn_chain(dg, db, sc, mean, var, n, dmean_in, dvar_in):
    """Folded-BN backward: (dg, db) wrt g = sc*r, b = bi - mean*g ->
    (dsc, dbi, ds, dss) with incoming mean/var cotangents added."""
    r = jax.lax.rsqrt(var + EPS)
    dsc = dg * r - db * mean * r
    dbi = db
    dmean = -db * sc * r + dmean_in
    dvar = (dg - db * mean) * sc * (-0.5) * r ** 3 + dvar_in
    ds = dmean / n - 2.0 * mean * dvar / n
    dss = dvar / n
    return dsc, dbi, ds, dss


def _bwd_impl(dtype, res, params, dy3_nhwc, dmeans, dvars):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (xe, xo, y1, y2a, y2b, ce, co, y3, means, variances) = res
    (k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b, k3) = params
    (mean1, mean2a, mean2b, mean3) = means
    (var1, var2a, var2b, var3) = variances
    b, hp2, cm, w2 = y1.shape
    ch = cm // 2
    cc = 2 * cm
    h2 = (hp2 - R)
    h4, w4 = h2 // 2, w2 // 2
    nb = h2 // R
    nb4 = h4 // R
    cin_p = xe.shape[2]
    cin = k1.shape[2]
    co3 = y3.shape[2]
    n1 = b * h2 * w2
    n3 = b * h4 * w4

    g1, b1 = _fold_bn(sc1, bi1, mean1, var1)
    g2a, b2a = _fold_bn(sc2a, bi2a, mean2a, var2a)
    g2b, b2b = _fold_bn(sc2b, bi2b, mean2b, var2b)

    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    def bcast(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda bb, ii: (0,) * n)

    def row_out(rows, c, wl):
        return pl.BlockSpec((None, rows, c, wl),
                            lambda bb, ii: (bb, ii, 0, 0))

    def const2(shape):
        return pl.BlockSpec(shape, lambda bb, ii: (0, 0))

    # stats3 cotangent fold (XLA, H/4 resolution)
    ds3 = dmeans[3] / n3 - 2.0 * mean3 * dvars[3] / n3
    dss3 = dvars[3] / n3
    dy3 = dy3_nhwc  # planes (B, h4, co3, w4) — caller passes planes
    dy3_eff = (dy3.astype(jnp.float32) + ds3[None, None, :, None]
               + 2.0 * y3[:, :h4].astype(jnp.float32)
               * dss3[None, None, :, None]).astype(dtype)
    dy3p = jnp.pad(dy3_eff, ((0, 0), (1, R + 7), (0, 0), (0, 0)))

    # K5b: dk3 + dce/dco
    dk3f, dce, dco = pl.pallas_call(
        functools.partial(_stem3_bwd_kernel, w4=w4, cc=cc, co3=co3,
                          dtype=dtype),
        grid=(b, nb4),
        in_specs=[anyspec, anyspec, anyspec, bcast((9 * cc, co3))],
        out_specs=(const2((9 * cc, co3)), row_out(2 * R, cc, w4),
                   row_out(2 * R, cc, w4)),
        out_shape=(jax.ShapeDtypeStruct((9 * cc, co3), jnp.float32),
                   jax.ShapeDtypeStruct((b, h2, cc, w4), dtype),
                   jax.ShapeDtypeStruct((b, h2, cc, w4), dtype)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, cc, w4), dtype),
                        pltpu.VMEM((2, 2 * R + 2, cc, w4), dtype),
                        pltpu.VMEM((2, 2 * R, co3, w4), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(ce, co, dy3p, k3.reshape(9 * cc, co3))

    # interleave to dcat, +1-shift for K4b
    dcat = jnp.stack([dce, dco], -1).reshape(b, h2, cc, w2)
    dcatp = _pad_top(dcat, h2 + 8)
    y1p = _pad_top(y1[:, :h2], h2 + 8)

    # K4b: pool + a2b backward
    da1p, dy2b_chain, g2bacc, g1aacc = pl.pallas_call(
        functools.partial(_assemble_bwd_kernel, w2=w2, cm=cm, h2=h2,
                          dtype=dtype),
        grid=(b, nb),
        in_specs=[anyspec, anyspec, anyspec,
                  bcast((cm, 128)), bcast((cm, 128)),
                  bcast((cm, 128)), bcast((cm, 128))],
        out_specs=(row_out(R, cm, w2), row_out(R, cm, w2),
                   const2((cm, 128)), const2((cm, 128))),
        out_shape=(jax.ShapeDtypeStruct((b, h2, cm, w2), dtype),
                   jax.ShapeDtypeStruct((b, h2, cm, w2), dtype),
                   jax.ShapeDtypeStruct((cm, 128), jnp.float32),
                   jax.ShapeDtypeStruct((cm, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, R + 8, cm, w2), dtype),
                        pltpu.VMEM((2, R, cm, w2), dtype),
                        pltpu.VMEM((2, R + 8, cc, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y1p, y2b, dcatp, _vec_tile(g1), _vec_tile(b1), _vec_tile(g2b),
      _vec_tile(b2b))

    dsc2b, dbi2b, ds2b, dss2b = _bn_chain(
        g2bacc[:, 0], g2bacc[:, 1], sc2b, mean2b, var2b, n1,
        dmeans[2], dvars[2])

    # K3b: stem2b backward (chains into a2a)
    dy2bp = _pad_top(dy2b_chain, h2 + 8)
    y2bp = _pad_top(y2b[:, :h2], h2 + 8)
    dk2bf, dy2a_chain, g2aacc = pl.pallas_call(
        functools.partial(_conv2x2_bwd_kernel, w2=w2, cin=ch, cout=cm,
                          h2=h2, chain=True, dtype=dtype),
        grid=(b, nb),
        in_specs=[anyspec, anyspec, anyspec, bcast((4 * ch, cm)),
                  bcast((ch, 128)), bcast((ch, 128)),
                  bcast((cm, 128)), bcast((cm, 128))],
        out_specs=(const2((4 * ch, cm)), row_out(R, ch, w2),
                   const2((ch, 128))),
        out_shape=(jax.ShapeDtypeStruct((4 * ch, cm), jnp.float32),
                   jax.ShapeDtypeStruct((b, h2, ch, w2), dtype),
                   jax.ShapeDtypeStruct((ch, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R, ch, w2), dtype),
                        pltpu.VMEM((2, R + 8, cm, w2), dtype),
                        pltpu.VMEM((2, R + 8, cm, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y2a, dy2bp, y2bp, k2b.reshape(4 * ch, cm),
      _vec_tile(g2a), _vec_tile(b2a), _vec_tile(ds2b), _vec_tile(dss2b))

    dsc2a, dbi2a, ds2a, dss2a = _bn_chain(
        g2aacc[:, 0], g2aacc[:, 1], sc2a, mean2a, var2a, n1,
        dmeans[1], dvars[1])

    # K2b: stem2a backward (raw da1)
    dy2ap = _pad_top(dy2a_chain, h2 + 8)
    y2ap = _pad_top(y2a[:, :h2], h2 + 8)
    dk2af, da1k, g1bacc = pl.pallas_call(
        functools.partial(_conv2x2_bwd_kernel, w2=w2, cin=cm, cout=ch,
                          h2=h2, chain=False, dtype=dtype),
        grid=(b, nb),
        in_specs=[anyspec, anyspec, anyspec, bcast((4 * cm, ch)),
                  bcast((cm, 128)), bcast((cm, 128)),
                  bcast((ch, 128)), bcast((ch, 128))],
        out_specs=(const2((4 * cm, ch)), row_out(R, cm, w2),
                   const2((cm, 128))),
        out_shape=(jax.ShapeDtypeStruct((4 * cm, ch), jnp.float32),
                   jax.ShapeDtypeStruct((b, h2, cm, w2), dtype),
                   jax.ShapeDtypeStruct((cm, 128), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, 2 * R, cm, w2), dtype),
                        pltpu.VMEM((2, R + 8, ch, w2), dtype),
                        pltpu.VMEM((2, R + 8, ch, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(y1, dy2ap, y2ap, k2a.reshape(4 * cm, ch),
      _vec_tile(g1), _vec_tile(b1), _vec_tile(ds2a), _vec_tile(dss2a))
    # NOTE: K2b's gacc partials were computed with mask from y1 — they are
    # the K2-path bn1 partials.

    dg1 = g1aacc[:, 0] + g1bacc[:, 0]
    db1 = g1aacc[:, 1] + g1bacc[:, 1]
    dsc1, dbi1, ds1, dss1 = _bn_chain(
        dg1, db1, sc1, mean1, var1, n1, dmeans[0], dvars[0])

    # K1b: stem1 weight grad
    k1p = jnp.pad(k1, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    (dk1f,) = pl.pallas_call(
        functools.partial(_stem1_bwd_kernel, w2=w2, cin=cin_p, cm=cm,
                          dtype=dtype),
        grid=(b, nb),
        in_specs=[anyspec, anyspec, anyspec, anyspec, anyspec,
                  bcast((cm, 128)), bcast((cm, 128)),
                  bcast((cm, 128)), bcast((cm, 128))],
        out_specs=(const2((9 * cin_p, cm)),),
        out_shape=(jax.ShapeDtypeStruct((9 * cin_p, cm), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((2, 2 * R + 2, cin_p, w2), dtype),
                        pltpu.VMEM((2, 2 * R + 2, cin_p, w2), dtype),
                        pltpu.VMEM((2, R, cm, w2), dtype),
                        pltpu.VMEM((2, R, cm, w2), dtype),
                        pltpu.VMEM((2, R, cm, w2), dtype),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_interpret(),
    )(xe, xo, y1, da1p, da1k, _vec_tile(g1), _vec_tile(b1),
      _vec_tile(ds1), _vec_tile(dss1))

    dx = jnp.zeros((b, 2 * h2, 2 * w2, cin), _bwd_impl.x_dtype_holder)
    dk1 = dk1f.reshape(3, 3, cin_p, cm)[:, :, :cin].astype(k1.dtype)
    dk2a = dk2af.reshape(2, 2, cm, ch).astype(k2a.dtype)
    dk2b = dk2bf.reshape(2, 2, ch, cm).astype(k2b.dtype)
    dk3 = dk3f.reshape(3, 3, cc, co3).astype(k3.dtype)
    return (dx, dk1, dsc1.astype(sc1.dtype), dbi1.astype(bi1.dtype),
            dk2a, dsc2a.astype(sc2a.dtype), dbi2a.astype(bi2a.dtype),
            dk2b, dsc2b.astype(sc2b.dtype), dbi2b.astype(bi2b.dtype),
            dk3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _stem_core_diff(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b,
                    k3, dtype):
    out, _ = _stem_core(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b,
                        bi2b, k3, dtype)
    return out


def _core_fwd(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b,
              k3, dtype):
    out, res = _stem_core(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b,
                          bi2b, k3, dtype)
    params = (k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b, k3)
    # the input cotangent is structurally zero (x is the image); keep a
    # zero-size slice so the bwd knows its dtype without saving x
    _bwd_impl.x_dtype_holder = x.dtype
    return out, (res, params)


def _core_bwd(dtype, full_res, cot):
    res, params = full_res
    dy3, dmeans, dvars = cot
    return _bwd_impl(dtype, res, params, dy3, dmeans, dvars)


_stem_core_diff.defvjp(_core_fwd, _core_bwd)


def stem_fused_inference(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b,
                         bi2b, k3, means, variances,
                         dtype=jnp.bfloat16):
    """Eval-mode fused stem: BN folds use the provided RUNNING stats.
    No custom VJP (inference path); returns y3_nhwc_pre_bn3 only."""
    (y3, _, _), _ = _stem_core(x, k1, sc1, bi1, k2a, sc2a, bi2a, k2b,
                               sc2b, bi2b, k3, dtype,
                               use_stats=(means, variances))
    b, h, w, _ = x.shape
    h4 = h // 4
    return y3[:, :h4].transpose(0, 1, 3, 2)
