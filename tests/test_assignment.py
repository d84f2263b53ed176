"""ops/assignment.py: auction solver — Pallas kernel vs XLA reference.

The Pallas kernel (interpret mode on CPU) must reproduce the XLA
reference's owner array EXACTLY in the normal regime and match the XLA
greedy completion in the capped regime (continuous random costs — no
ties, so tie-breaking differences cannot mask divergence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_object_detection_tpu.ops import assignment as A


@pytest.fixture(autouse=True)
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(A, "_INTERPRET", True)


def make_cost(rng, b, q, m, n_valid):
    cost = rng.randn(b, q, m).astype(np.float32) * 5
    valid = np.zeros((b, m), bool)
    for i in range(b):
        valid[i, :n_valid[i]] = True
        cost[i, :, n_valid[i]:] = A.BIG
    return jnp.asarray(cost), jnp.asarray(valid)


def test_pallas_matches_ref_normal_regime():
    rng = np.random.RandomState(0)
    cost, valid = make_cost(rng, 4, 64, 40, [40, 12, 1, 0])
    own_ref, cap_ref = A.auction_assignment_ref(cost, valid)
    own_pl, cap_pl = A.auction_assignment(cost, valid, use_pallas=True)
    assert not np.asarray(cap_ref).any()
    np.testing.assert_array_equal(np.asarray(cap_ref), np.asarray(cap_pl))
    np.testing.assert_array_equal(np.asarray(own_ref), np.asarray(own_pl))


def test_pallas_greedy_completion_capped_regime():
    rng = np.random.RandomState(1)
    # more valid GTs than queries: the auction can never finish
    cost, valid = make_cost(rng, 2, 16, 24, [24, 20])
    own, cap = A.auction_assignment(cost, valid, max_rounds=30,
                                    use_pallas=True)
    assert np.asarray(cap).all()
    o = np.asarray(own)
    for i, nv in enumerate([24, 20]):
        got = o[i][o[i] >= 0]
        assert len(set(got.tolist())) == len(got)      # one-to-one
        assert (got < nv).all()                        # only real gts
        assert len(got) == 16                          # maximal (Q < n)
    own_g = np.asarray(A._greedy_owner(cost, 24))
    np.testing.assert_array_equal(own_g, o)


def test_ref_path_greedy_completion_via_cond():
    rng = np.random.RandomState(2)
    cost, valid = make_cost(rng, 2, 16, 24, [24, 3])
    own, cap = jax.jit(
        lambda c: A.auction_assignment(c, valid, max_rounds=30))(cost)
    assert bool(cap[0]) and not bool(cap[1])
    o = np.asarray(own)
    # capped image 0 replaced by the greedy solve; image 1 untouched
    own_g = np.asarray(A._greedy_owner(cost, 24))
    np.testing.assert_array_equal(o[0], own_g[0])
    got1 = o[1][o[1] >= 0]
    assert len(got1) == 3 and (got1 < 3).all()


def test_empty_and_single_gt():
    rng = np.random.RandomState(3)
    cost, valid = make_cost(rng, 2, 8, 4, [0, 1])
    for kw in ({"use_pallas": True}, {}):
        own, cap = A.auction_assignment(cost, valid, **kw)
        o = np.asarray(own)
        assert not np.asarray(cap).any()
        assert (o[0] == -1).all()
        assert (o[1] >= 0).sum() == 1 and set(o[1]) <= {-1, 0}
