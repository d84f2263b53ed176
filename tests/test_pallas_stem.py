"""Fused Pallas HGStem (ops/pallas_stem.py): value + grad parity against
the XLA module path, in interpret mode on the CPU mesh.

The kernels' only approximation is the folded-BN association order
(g*y + b vs (y-m)*r*sc + bi); the tolerance is calibrated by comparing
the XLA reference against ITSELF in folded form (same ~1e-3 rel noise,
see STATUS r3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_object_detection_tpu.ops import pallas_stem as PS
from robust_object_detection_tpu.models import rtdetr as R

B, H, W = 2, 64, 256
CM = 32


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(PS, "_INTERPRET", True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    params = (
        jnp.asarray(rng.randn(3, 3, 3, CM) * 0.2, jnp.float32),
        jnp.asarray(rng.rand(CM) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(CM) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(2, 2, CM, CM // 2) * 0.2, jnp.float32),
        jnp.asarray(rng.rand(CM // 2) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(CM // 2) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(2, 2, CM // 2, CM) * 0.2, jnp.float32),
        jnp.asarray(rng.rand(CM) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(CM) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, 2 * CM, CM) * 0.1, jnp.float32),
    )
    return x, params


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _reference(x, params):
    (k1, sc1, bi1, k2a, sc2a, bi2a, k2b, sc2b, bi2b, k3) = params

    def bn_relu(y, sc, bi):
        m = y.mean((0, 1, 2))
        v = jnp.maximum(0.0, (y * y).mean((0, 1, 2)) - m * m)
        return (jnp.maximum((y - m) * jax.lax.rsqrt(v + PS.EPS) * sc + bi,
                            0.0), m, v)

    y1 = _conv(x, k1, 2, ((1, 1), (1, 1)))
    a1, m1, v1 = bn_relu(y1, sc1, bi1)
    pz = ((0, 0), (0, 1), (0, 1), (0, 0))
    y2a = _conv(jnp.pad(a1, pz), k2a, 1, ((0, 0), (0, 0)))
    a2a, m2a, v2a = bn_relu(y2a, sc2a, bi2a)
    y2b = _conv(jnp.pad(a2a, pz), k2b, 1, ((0, 0), (0, 0)))
    a2b, m2b, v2b = bn_relu(y2b, sc2b, bi2b)
    hh, ww = a1.shape[1], a1.shape[2]
    ap = jnp.pad(a1, pz)
    pool = jnp.maximum(jnp.maximum(ap[:, :hh, :ww], ap[:, 1:, :ww]),
                       jnp.maximum(ap[:, :hh, 1:], ap[:, 1:, 1:]))
    y3 = _conv(jnp.concatenate([pool, a2b], -1), k3, 2, ((1, 1), (1, 1)))
    m3 = y3.mean((0, 1, 2))
    v3 = jnp.maximum(0.0, (y3 * y3).mean((0, 1, 2)) - m3 * m3)
    return y3, (m1, m2a, m2b, m3), (v1, v2a, v2b, v3)


def test_forward_parity(data):
    x, params = data
    y3r, mr, vr = _reference(x, params)
    y3f, mf, vf = PS.stem_fused(x, *params, dtype=jnp.float32)
    assert y3f.shape == y3r.shape
    scale = float(jnp.abs(y3r).max())
    assert float(jnp.abs(y3f - y3r).max()) < 3e-3 * scale
    for i in range(4):
        np.testing.assert_allclose(mf[i], mr[i], atol=1e-4)
        np.testing.assert_allclose(vf[i], vr[i], atol=1e-4, rtol=1e-4)


def test_grad_parity(data):
    x, params = data

    def loss(fn, params):
        y3, m, v = fn(x, params)
        w = jnp.arange(y3.size, dtype=jnp.float32).reshape(y3.shape) % 7 - 3
        z = (y3 - m[3]) * jax.lax.rsqrt(v[3] + PS.EPS)
        return jnp.sum(z * w) + 0.01 * jnp.sum(y3)

    gr = jax.grad(lambda p: loss(
        lambda x_, p_: _reference(x_, p_), params))(params)
    gf = jax.grad(lambda p: loss(
        lambda x_, p_: PS.stem_fused(x_, *p_, dtype=jnp.float32),
        params))(params)
    for a, b in zip(gr, gf):
        scale = float(jnp.abs(a).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) < 6e-3 * scale


def test_module_integration(data, monkeypatch):
    """HGStem routes to the fused op; params/stats trees identical to the
    XLA branch; train forward + batch_stats + eval forward agree."""
    x, _ = data
    mod = R.HGStem(CM, 48)
    v_fused = mod.init(jax.random.key(0), x, True)
    # tree identical to an XLA-branch init (unsupported size)
    x_small = jnp.zeros((1, 32, 32, 3))
    v_xla = mod.init(jax.random.key(0), x_small, True)
    assert (jax.tree_util.tree_structure(v_fused)
            == jax.tree_util.tree_structure(v_xla))

    out_f, st_f = mod.apply(v_fused, x, True, mutable=["batch_stats"])
    sup = PS.supported
    monkeypatch.setattr(PS, "supported", lambda s, **k: False)
    out_x, st_x = mod.apply(v_fused, x, True, mutable=["batch_stats"])
    monkeypatch.setattr(PS, "supported", sup)
    scale = float(jnp.abs(out_x).max())
    assert float(jnp.abs(out_f - out_x).max()) < 5e-3 * scale
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_x)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    ve = {"params": v_fused["params"], **st_f}
    out_fe = mod.apply(ve, x, False)
    monkeypatch.setattr(PS, "supported", lambda s, **k: False)
    out_xe = mod.apply(ve, x, False)
    assert float(jnp.abs(out_fe - out_xe).max()) < 5e-3 * (
        float(jnp.abs(out_xe).max()) + 1e-9)


def test_supported_gate():
    assert PS.supported((8, 1024, 1024, 3))
    assert PS.supported((8, 768, 1280, 3))
    assert not PS.supported((8, 1024, 1000, 3))   # W not mult 256
    assert not PS.supported((8, 100, 1024, 3))    # H not mult 64
    assert not PS.supported((8, 64, 64, 3))       # W too small


# ── planes conv3x3 + fused HGBlock (ops/pallas_conv.py) ──────────────────

def test_conv3x3_planes_exact():
    """The planes conv kernel and its VJP are exact vs lax.conv (f32)."""
    from robust_object_detection_tpu.ops import pallas_conv as PC
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 8, 128), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.3, jnp.float32)

    def ref(x, k):
        xn = x.transpose(0, 1, 3, 2)
        y = jax.lax.conv_general_dilated(
            xn, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.transpose(0, 1, 3, 2)

    y1 = PC.conv3x3_planes(x, k, jnp.float32)
    np.testing.assert_allclose(y1, ref(x, k), atol=1e-5)
    w = jnp.asarray(rng.randn(*y1.shape), jnp.float32)
    g1 = jax.grad(lambda a, b: jnp.sum(
        PC.conv3x3_planes(a, b, jnp.float32) * w), (0, 1))(x, k)
    g2 = jax.grad(lambda a, b: jnp.sum(ref(a, b) * w), (0, 1))(x, k)
    np.testing.assert_allclose(g1[0], g2[0], atol=1e-4)
    np.testing.assert_allclose(g1[1], g2[1], atol=1e-3)


def test_hgblock_fused_parity(monkeypatch):
    """Fused (planes) HGBlock vs the NHWC flax path: identical tree,
    matching outputs/stats; grads within the chain-amplification band
    (6 normalize+relu boundaries amplify f32 noise; single layers are
    exact to 1e-6 — see test_conv3x3_planes_exact)."""
    from robust_object_detection_tpu.ops import pallas_conv as PC
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 128, 48), jnp.float32)
    mod = R.HGBlock(48, 128, 3)
    v_f = mod.init(jax.random.key(0), x, True)
    v_x = mod.init(jax.random.key(0), jnp.zeros((1, 8, 9, 48)), True)
    assert (jax.tree_util.tree_structure(v_f)
            == jax.tree_util.tree_structure(v_x))

    out_f, st_f = mod.apply(v_f, x, True, mutable=["batch_stats"])
    sup = PC.supported
    monkeypatch.setattr(PC, "supported", lambda s: False)
    out_x, st_x = mod.apply(v_f, x, True, mutable=["batch_stats"])
    monkeypatch.setattr(PC, "supported", sup)
    scale = float(jnp.abs(out_x).max())
    assert float(jnp.abs(out_f - out_x).max()) < 1e-2 * scale
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_x)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    def loss(params, fused):
        if not fused:
            monkeypatch.setattr(PC, "supported", lambda s: False)
        out, _ = mod.apply(
            {"params": params, "batch_stats": v_f["batch_stats"]},
            x, True, mutable=["batch_stats"])
        monkeypatch.setattr(PC, "supported", sup)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * (w % 5 - 2))

    gf = jax.grad(lambda p: loss(p, True))(v_f["params"])
    gx = jax.grad(lambda p: loss(p, False))(v_f["params"])
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        scale = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) < 0.15 * scale
