"""Feasibility probes for the fused Pallas stem (see ops/pallas_stem.py).

Each probe isolates one Mosaic capability the kernel design depends on:

  strided   lane-strided slice y = x[:, 0::2] inside a kernel
  deint3    stride-3 deinterleave of an interleaved (W*3,) RGB row
  planes    (C, W)-layout row matmul: y^T (32, 512) = K^T (32, 27) @
            P (27, 512) with P stacked from shifted plane rows
  u8load    uint8 block load + f32 convert + scale in-kernel

Run: PYTHONPATH=/root/repo python tools/exp_pallas_stem.py --exp strided
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, args, n=20):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            out = fn(*jax.tree.map(
                lambda t: t + (carry * 0).astype(t.dtype) if t.dtype != jnp.uint8 else t, a))
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out))
            return s * 1e-20 + carry * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c
    jax.device_get(chain(*args))
    t0 = time.time()
    jax.device_get(chain(*args))
    return (time.time() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", required=True)
    args = p.parse_args()
    rng = np.random.RandomState(0)

    if args.exp == "strided":
        x = jnp.asarray(rng.rand(256, 1024), jnp.float32)

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[:, 0::2]

        f = lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
        )(x)
        y = f(x)
        ref = x[:, 0::2]
        print("strided ok:", bool(jnp.allclose(y, ref)), f"{timed(f, (x,))*1e3:.3f} ms")

    elif args.exp == "deint3":
        x = jnp.asarray(rng.rand(256, 3072), jnp.float32)

        def kernel(x_ref, o_ref):
            for c in range(3):
                o_ref[:, c, :] = x_ref[:, c::3]

        f = lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, 3, 1024), jnp.float32),
        )(x)
        y = f(x)
        ref = x.reshape(256, 1024, 3).transpose(0, 2, 1)
        print("deint3 ok:", bool(jnp.allclose(y, ref)), f"{timed(f, (x,))*1e3:.3f} ms")

    elif args.exp == "planes":
        # one grid step per 8 output rows; P stacked from 27 shifted rows
        H2, W2 = 512, 512
        xs = jnp.asarray(rng.rand(H2 + 1, 12, W2 + 1), jnp.float32)  # halo
        k = jnp.asarray(rng.randn(27, 32) * 0.1, jnp.float32)
        R = 8

        def kernel(xs_ref, k_ref, o_ref):
            kT = k_ref[...].T                                    # (32, 27)
            for r in range(R):
                rows = []
                for ry in (0, 1):
                    for pc in range(12):
                        for rx in (0, 1):
                            rows.append(xs_ref[r + ry, pc, rx:rx + W2])
                P = jnp.stack(rows[:27], 0)                       # (27, W2)
                o_ref[r] = jax.lax.dot_general(
                    kT, P, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        f = lambda xs, k: pl.pallas_call(
            kernel,
            grid=(H2 // R,),
            in_specs=[
                pl.BlockSpec((R + 1, 12, W2 + 1), lambda i: (i, 0, 0)),
                pl.BlockSpec((27, 32), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((R, 32, W2), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H2, 32, W2), jnp.float32),
        )(xs, k)
        y = f(xs, k)
        # reference
        rows = []
        for ry in (0, 1):
            for pc in range(12):
                for rx in (0, 1):
                    rows.append(np.asarray(xs)[:, pc, rx:rx + W2][
                        np.arange(H2)[:, None] + ry, :])
        P = np.stack(rows[:27], 1)                               # (H2, 27, W2)
        ref = np.einsum("kc,hkw->hcw", np.asarray(k), P)
        print("planes ok:", bool(np.allclose(np.asarray(y), ref, atol=1e-4)),
              f"{timed(f, (xs, k))*1e3:.3f} ms")

    elif args.exp == "u8load":
        x = jnp.asarray(rng.randint(0, 255, (512, 1024), np.uint8))

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...].astype(jnp.float32) * (1 / 255.0)

        f = lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((512, 1024), jnp.float32),
        )(x)
        y = f(x)
        print("u8load ok:", bool(jnp.allclose(y, x.astype(jnp.float32) / 255)),
              f"{timed(f, (x,))*1e3:.3f} ms")


if __name__ == "__main__":
    main()
