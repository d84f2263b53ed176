"""ops/deform: custom-VJP bilinear sampling gradient parity.

The custom backward (stamp-scatter dV + analytic coordinate grads) must
match plain JAX autodiff of the same forward exactly (the CPU/XLA fallback
path; the Pallas path is exercised on TPU by the RT-DETR train step)."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_object_detection_tpu.ops import deform


def _reference_forward(v, sx, sy):
    """The same math without the custom VJP: autodiff ground truth."""
    b, h, w, n_h, dh = v.shape
    idxs, wgts, _, _ = deform._tap_geometry(sx, sy, h, w)
    g = deform._gather_taps(v, idxs, n_h)
    wgt = jnp.stack(wgts, -1)
    return (g * wgt[..., None]).sum(-2)


def _inputs(rng, b=2, h=6, w=5, heads=3, dh=4, q=7, p=2):
    v = jnp.asarray(rng.standard_normal((b, h, w, heads, dh)),
                    jnp.float32)
    # spread samples inside, near edges and outside the map
    sx = jnp.asarray(rng.uniform(-1.5, w + 1.0, (b, q, heads, p)),
                     jnp.float32)
    sy = jnp.asarray(rng.uniform(-1.5, h + 1.0, (b, q, heads, p)),
                     jnp.float32)
    return v, sx, sy


def test_forward_matches_reference(rng):
    v, sx, sy = _inputs(rng)
    np.testing.assert_allclose(
        np.asarray(deform.bilinear_sample(v, sx, sy)),
        np.asarray(_reference_forward(v, sx, sy)), atol=1e-6)


def test_grads_match_autodiff(rng):
    v, sx, sy = _inputs(rng)
    cot = jnp.asarray(rng.standard_normal(
        deform.bilinear_sample(v, sx, sy).shape), jnp.float32)

    def loss_custom(v, sx, sy):
        return (deform.bilinear_sample(v, sx, sy) * cot).sum()

    def loss_ref(v, sx, sy):
        return (_reference_forward(v, sx, sy) * cot).sum()

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(v, sx, sy)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(v, sx, sy)
    for gc, gr, name in zip(g_custom, g_ref, ("dv", "dsx", "dsy")):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_stamp_scatter_matches_numpy(rng):
    b, n_h, dh, t, hw = 2, 3, 4, 11, 13
    idx = jnp.asarray(rng.integers(0, hw, (b, n_h, t)), jnp.int32)
    gw = jnp.asarray(rng.standard_normal((b, n_h, dh, t)), jnp.float32)
    out = np.asarray(deform._stamp_scatter(idx, gw, hw))
    expect = np.zeros((b, n_h, dh, hw), np.float32)
    for bi in range(b):
        for hi in range(n_h):
            for ti in range(t):
                expect[bi, hi, :, int(idx[bi, hi, ti])] += np.asarray(
                    gw[bi, hi, :, ti])
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_train_step_grad_flow(rng):
    """The custom VJP plugs into the RT-DETR decoder: grads reach the
    value maps through MSDeformAttn."""
    from robust_object_detection_tpu.models.rtdetr import (MSDeformAttn,
                                                           RtDetrConfig)
    cfg = RtDetrConfig(num_classes=3, dec_layers=1, queries=8)
    m = MSDeformAttn(cfg)
    q = jnp.asarray(rng.standard_normal((1, 8, 256)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (1, 8, 4)), jnp.float32)
    levels = [jnp.asarray(rng.standard_normal((1, s, s, 256)), jnp.float32)
              for s in (8, 4, 2)]
    params = m.init(jax.random.key(0), q, ref, levels)

    def loss(levels):
        return m.apply(params, q, ref, levels).sum()

    grads = jax.grad(loss)(levels)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0


class TestFusedMsDeformAttn:
    """ms_deform_attn: the interpreted Pallas kernels must match the XLA
    reference path bit-close in forward AND in all three gradients."""

    @staticmethod
    def _inputs(rng, b=2, q=7, heads=2, dh=8, p=3,
                shapes=((8, 8), (4, 4), (2, 2))):
        hw = sum(h * w for h, w in shapes)
        values = jnp.asarray(rng.standard_normal((b, hw, heads, dh)),
                             jnp.float32)
        n_l = len(shapes)
        # locations spread inside + outside [0, 1]
        loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, heads, n_l, p, 2)),
                          jnp.float32)
        attn = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((b, q, heads, n_l * p)), jnp.float32), -1
        ).reshape(b, q, heads, n_l, p)
        return values, shapes, loc, attn

    def test_forward_parity(self, rng):
        values, shapes, loc, attn = self._inputs(rng)
        ref = deform.ms_deform_attn_ref(values, shapes, loc, attn)
        deform._INTERPRET = True
        try:
            out = deform._ms_deform_attn_tpu(shapes, values, loc, attn)
        finally:
            deform._INTERPRET = False
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_transposed_values_parity(self, rng):
        """ms_deform_attn_t (pre-transposed v^T layout) matches the
        values-layout op in value and gradients (interpret mode)."""
        values, shapes, loc, attn = self._inputs(rng)
        b, hw, heads, dh = values.shape
        values_t = values.transpose(0, 2, 3, 1).reshape(b, heads, dh, hw)
        cot = jnp.asarray(rng.standard_normal(
            (b, loc.shape[1], heads, dh)), jnp.float32)

        def loss_ref(v, l, a):
            return (deform.ms_deform_attn_ref(v, shapes, l, a) * cot).sum()

        def loss_t(vt, l, a):
            return (deform._ms_deform_attn_tpu_t(shapes, vt, l, a)
                    * cot).sum()

        ref = deform.ms_deform_attn_ref(values, shapes, loc, attn)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(values, loc, attn)
        deform._INTERPRET = True
        try:
            out = deform._ms_deform_attn_tpu_t(shapes, values_t, loc, attn)
            g_t = jax.grad(loss_t, argnums=(0, 1, 2))(values_t, loc, attn)
        finally:
            deform._INTERPRET = False
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)
        dv_ref_t = np.asarray(g_ref[0]).transpose(0, 2, 3, 1).reshape(
            b, heads, dh, hw)
        np.testing.assert_allclose(np.asarray(g_t[0]), dv_ref_t,
                                   atol=5e-2, rtol=5e-2)
        for gr, gt in zip(g_ref[1:], g_t[1:]):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                       atol=5e-2, rtol=5e-2)

    def test_grad_parity(self, rng):
        values, shapes, loc, attn = self._inputs(rng)
        cot = jnp.asarray(rng.standard_normal(
            (values.shape[0], loc.shape[1], values.shape[2],
             values.shape[3])), jnp.float32)

        def loss_ref(v, l, a):
            return (deform.ms_deform_attn_ref(v, shapes, l, a) * cot).sum()

        def loss_tpu(v, l, a):
            return (deform._ms_deform_attn_tpu(shapes, v, l, a) * cot).sum()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(values, loc, attn)
        deform._INTERPRET = True
        try:
            g_tpu = jax.grad(loss_tpu, argnums=(0, 1, 2))(values, loc, attn)
        finally:
            deform._INTERPRET = False
        for gr, gt, name in zip(g_ref, g_tpu, ("dvalues", "dloc", "dattn")):
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gr), atol=5e-2, rtol=5e-2,
                err_msg=name)

    def test_ref_matches_per_level_composition(self, rng):
        """The merged-level reference equals the per-level bilinear path
        the model used before fusion (exact same tap math)."""
        values, shapes, loc, attn = self._inputs(rng)
        b, hw, heads, dh = values.shape
        ref = deform.ms_deform_attn_ref(values, shapes, loc, attn)
        out = jnp.zeros((b, loc.shape[1], heads, dh), jnp.float32)
        off = 0
        for l, (h, w) in enumerate(shapes):
            v = values[:, off:off + h * w].reshape(b, h, w, heads, dh)
            sx = loc[..., l, :, 0] * w - 0.5
            sy = loc[..., l, :, 1] * h - 0.5
            sampled = deform.bilinear_sample(v, sx, sy)
            out = out + (sampled * attn[..., l, :, None]).sum(-2)
            off += h * w
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=1e-5)


def test_fused_nonsquare_levels_and_eval_q(rng):
    """Non-square level shapes + a Q below the 128-lane pad (eval path,
    no CDN) through the interpreted kernels."""
    shapes = ((6, 10), (3, 5))
    hw = sum(h * w for h, w in shapes)
    b, heads, dh, p, q = 1, 2, 8, 2, 3
    values = jnp.asarray(rng.standard_normal((b, hw, heads, dh)),
                         jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, (b, q, heads, 2, p, 2)),
                      jnp.float32)
    attn = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((b, q, heads, 2 * p)), jnp.float32), -1
    ).reshape(b, q, heads, 2, p)
    ref = deform.ms_deform_attn_ref(values, shapes, loc, attn)
    deform._INTERPRET = True
    try:
        out = deform._ms_deform_attn_tpu(shapes, values, loc, attn)
    finally:
        deform._INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


class TestSlotLayoutMsDeformAttn:
    """ms_deform_attn_slots (level-major slot layout, sort-free): value and
    all three gradients must match the XLA reference in interpret mode,
    for any (unsorted) query order and with Q padding in play."""

    def _check(self, rng, **kw):
        values, shapes, loc, attn = TestFusedMsDeformAttn._inputs(rng, **kw)
        b, hw, heads, dh = values.shape
        values_t = values.transpose(0, 2, 3, 1).reshape(b, heads, dh, hw)
        cot = jnp.asarray(rng.standard_normal(
            (b, loc.shape[1], heads, dh)), jnp.float32)

        def loss_ref(v, l, a):
            return (deform.ms_deform_attn_ref(v, shapes, l, a) * cot).sum()

        def loss_s(vt, l, a):
            return (deform._ms_deform_slots_tpu(shapes, vt, l, a)
                    * cot).sum()

        ref = deform.ms_deform_attn_ref(values, shapes, loc, attn)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(values, loc, attn)
        deform._INTERPRET = True
        try:
            out = deform._ms_deform_slots_tpu(shapes, values_t, loc, attn)
            g_s = jax.grad(loss_s, argnums=(0, 1, 2))(values_t, loc, attn)
        finally:
            deform._INTERPRET = False
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)
        dv_ref_t = np.asarray(g_ref[0]).transpose(0, 2, 3, 1).reshape(
            b, heads, dh, hw)
        np.testing.assert_allclose(np.asarray(g_s[0]), dv_ref_t,
                                   atol=5e-2, rtol=5e-2, err_msg="dvalues")
        for gr, gt, name in zip(g_ref[1:], g_s[1:], ("dloc", "dattn")):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                                       atol=5e-2, rtol=5e-2, err_msg=name)

    def test_value_and_grad_parity(self, rng):
        self._check(rng)

    def test_points_p4_production_slot_width(self, rng):
        # P=4 -> slot width 16 (the production RT-DETR config)
        self._check(rng, p=4)

    def test_nonsquare_levels(self, rng):
        self._check(rng, shapes=((6, 10), (3, 5)), q=5)

    def test_geometry_batched_matches_merged(self, rng):
        """The level-vectorised geometry equals the per-level loop."""
        _, shapes, loc, attn = TestFusedMsDeformAttn._inputs(rng)
        got = deform._geometry_batched(loc, shapes)
        want = deform._merged_geometry(loc, shapes)
        for g, w, name in zip(got, want, ("idx", "w", "dwx", "dwy")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-6, err_msg=name)
