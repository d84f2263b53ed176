"""Fused Pallas YOLO front (ops/pallas_yolo_front.py): value + grad
parity against the XLA ConvBnAct chain, in interpret mode on CPU.

Same methodology as test_pallas_stem.py: the kernels' only approximation
is the folded-BN association order (g*y + b vs (y-m)*r*sc + bi), so
tolerances are relative ~1e-3."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_object_detection_tpu.ops import pallas_stem as PS
from robust_object_detection_tpu.ops import pallas_yolo_front as YF

B, H, W = 2, 32, 64
C1, C2 = 16, 32


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(PS, "_INTERPRET", True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    params = (
        jnp.asarray(rng.randn(3, 3, 3, C1) * 0.2, jnp.float32),
        jnp.asarray(rng.rand(C1) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(C1) * 0.1, jnp.float32),
        jnp.asarray(rng.randn(3, 3, C1, C2) * 0.2, jnp.float32),
    )
    bn2 = (jnp.asarray(rng.rand(C2) + 0.5, jnp.float32),
           jnp.asarray(rng.randn(C2) * 0.1, jnp.float32))
    return x, params, bn2


def _conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _reference(x, params):
    """XLA chain, NHWC: conv/2 -> batch BN -> silu -> conv/2 -> stats."""
    k1, sc1, bi1, k2 = params
    y1 = _conv(x, k1, 2)
    m1 = y1.mean((0, 1, 2))
    v1 = jnp.maximum(0.0, (y1 * y1).mean((0, 1, 2)) - m1 * m1)
    a1 = jax.nn.silu((y1 - m1) * jax.lax.rsqrt(v1 + PS.EPS) * sc1 + bi1)
    y2 = _conv(a1, k2, 2)
    m2 = y2.mean((0, 1, 2))
    v2 = jnp.maximum(0.0, (y2 * y2).mean((0, 1, 2)) - m2 * m2)
    # planes layout to match front_fused's output
    return y2.transpose(0, 1, 3, 2), m1, v1, m2, v2


def test_forward_parity(data):
    x, params, _ = data
    ref = _reference(x, params)
    out = YF.front_fused(x, *params, dtype=jnp.float32)
    assert out[0].shape == ref[0].shape
    scale = float(jnp.abs(ref[0]).max())
    assert float(jnp.abs(out[0] - ref[0]).max()) < 3e-3 * scale
    for i in (1, 2, 3, 4):
        np.testing.assert_allclose(out[i], ref[i], atol=1e-4, rtol=1e-3)


def test_grad_parity(data):
    x, params, bn2 = data
    sc2, bi2 = bn2

    def loss(fn, p, sc2, bi2):
        y2, m1, v1, m2, v2 = fn(x, p)
        a2 = jax.nn.silu((y2 - m2[None, None, :, None])
                         * jax.lax.rsqrt(v2 + PS.EPS)[None, None, :, None]
                         * sc2[None, None, :, None]
                         + bi2[None, None, :, None])
        w = jnp.arange(a2.size, dtype=jnp.float32).reshape(a2.shape) % 7 - 3
        # m1/v1 feed the running-stat update only — still exercise their
        # cotangents with a small direct term
        return (jnp.sum(a2 * w) + 0.1 * jnp.sum(m1) + 0.1 * jnp.sum(v1)
                + 0.05 * jnp.sum(m2 * v2))

    gr = jax.grad(lambda p, s, b: loss(_reference, p, s, b),
                  argnums=(0, 1, 2))(params, sc2, bi2)
    gf = jax.grad(lambda p, s, b: loss(
        lambda x_, p_: YF.front_fused(x_, *p_, dtype=jnp.float32),
        p, s, b), argnums=(0, 1, 2))(params, sc2, bi2)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        scale = float(jnp.abs(a).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) < 6e-3 * scale


def test_module_integration(monkeypatch):
    """Backbone routes P1/P2 to the fused front at supported sizes; the
    parameter/stat trees are identical to the XLA branch; train forward +
    batch_stats + eval forward agree."""
    from robust_object_detection_tpu.models import yolov8 as Y

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 64, 512, 3), jnp.float32)
    model = Y.Backbone(Y.YoloConfig(6, "n"))
    assert YF.supported(x.shape)
    v_fused = model.init(jax.random.key(0), x, True)
    v_xla = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), True)
    assert (jax.tree_util.tree_structure(v_fused)
            == jax.tree_util.tree_structure(v_xla))

    out_f, st_f = model.apply(v_fused, x, True, mutable=["batch_stats"])
    sup = YF.supported
    monkeypatch.setattr(YF, "supported", lambda s, **k: False)
    out_x, st_x = model.apply(v_fused, x, True, mutable=["batch_stats"])
    monkeypatch.setattr(YF, "supported", sup)
    for a, b in zip(jax.tree.leaves(out_f), jax.tree.leaves(out_x)):
        scale = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) < 1e-2 * scale
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_x)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    ve = {"params": v_fused["params"], **st_f}
    out_fe = model.apply(ve, x, False)
    monkeypatch.setattr(YF, "supported", lambda s, **k: False)
    out_xe = model.apply(ve, x, False)
    for a, b in zip(jax.tree.leaves(out_fe), jax.tree.leaves(out_xe)):
        scale = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a - b).max()) < 1e-2 * scale


def test_supported_gate():
    assert YF.supported((16, 1024, 1024, 3))
    assert YF.supported((8, 512, 512, 3))
    assert not YF.supported((8, 1024, 1000, 3))   # W not mult 512
    assert not YF.supported((8, 100, 1024, 3))    # H not mult 32
    assert not YF.supported((8, 64, 64, 3))       # W too small
