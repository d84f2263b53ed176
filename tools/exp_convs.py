"""A/B conv formulations for the small-channel backbone front on TPU.

Each experiment times fwd+bwd(params[,input]) of one op at production
shape (bs=8, 1024px RT-DETR train) with the in-jit scan harness.

  stem1_conv   3x3 s2 conv 3->32 @1024^2 (XLA conv, baseline)
  stem1_s2d    same op, input space-to-depth'd to (512^2, 12), kernel
               zero-padded 3x3->4x4 and split into 2x2 phase matmuls
  stem3_conv   3x3 s2 conv 64->32 @512^2 (XLA conv, baseline)
  stem3_s2d    same via s2d (256^2, 256) + 4 phase matmuls
  stage1_conv  3x3 s1 conv 48->48 @256^2 (XLA conv, baseline)
  stage1_im2col same as one K=432 matmul over conv_general_dilated_patches
  stem4_mm     1x1 32->48 @256^2 (dot_general baseline)
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, n):
    @jax.jit
    def chain(*args):
        def body(carry, _):
            out = fn(*jax.tree.map(
                lambda a: a + (carry * 1e-30).astype(a.dtype), args))
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(out))
            return s * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c
    jax.device_get(chain(*args))
    t0 = time.time()
    jax.device_get(chain(*args))
    return (time.time() - t0) / n


def conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); phase-major channel order."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def conv3s2_via_s2d(x, k):
    """3x3 stride-2 SAME conv == 2x2 stride-1 conv on the s2d grid with
    the 3x3 kernel zero-embedded in 4x4 and phase-split.

    SAME padding for odd H: output(i,j) = sum_{dy,dx in [-1,1]}
    x(2i+dy, 2j+dx) k(1+dy, 1+dx). Pad x by 1 on top/left and 2 on
    bottom/right (to 4x4 kernel support), s2d, then the 4x4 kernel's
    (2,2) phase blocks contract the 4C channels of 2x2 neighbouring s2d
    cells: y = sum_{cy,cx in {0,1}} s2d(xp)[i+cy, j+cx] @ K[cy,cx]
    where K[cy,cx][(py,px,c)] = k4(2cy+py, 2cx+px, c)."""
    b, h, w, c = x.shape
    co = k.shape[-1]
    k4 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))      # 4x4, taps at 1..3
    # out(i,j) = sum_{e,f in 0..3} P(2i+e, 2j+f) k4(e,f) with
    # P(a,b) = x(a-2, b-2): pad 2 on top/left (h even -> h+2 even)
    xp = jnp.pad(x, ((0, 0), (2, 0), (2, 0), (0, 0)))
    xs = s2d(xp)                                  # (B, h/2+1, w/2+1, 4C)
    h2, w2 = h // 2, w // 2
    # K[cy,cx]: (4C, co) with channel order (py, px, c) matching s2d
    def phase_k(cy, cx):
        kk = k4[2 * cy:2 * cy + 2, 2 * cx:2 * cx + 2]       # (2,2,C,co)
        return kk.reshape(4 * c, co)
    y = sum(
        jax.lax.dot_general(
            xs[:, cy:cy + h2, cx:cx + w2, :], phase_k(cy, cx),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for cy in (0, 1) for cx in (0, 1))
    return y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", required=True)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--bs", type=int, default=8)
    args = p.parse_args()
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    if args.exp.startswith("stem1"):
        x = jnp.asarray(rng.rand(args.bs, 1024, 1024, 3), bf)
        k = jnp.asarray(rng.randn(3, 3, 3, 32) * 0.1, bf)
        if args.exp == "stem1_conv":
            f = lambda k_: conv(x, k_, 2)
        else:
            f = lambda k_: conv3s2_via_s2d(x, k_)
        g = jax.grad(lambda k_: jnp.sum(f(k_).astype(jnp.float32)))
        dt = timed(g, (k,), args.n)
    elif args.exp.startswith("stem3"):
        x = jnp.asarray(rng.rand(args.bs, 512, 512, 64), bf)
        k = jnp.asarray(rng.randn(3, 3, 64, 32) * 0.1, bf)
        fwd = (lambda xx, kk: conv(xx, kk, 2)) if args.exp.endswith("conv") \
            else (lambda xx, kk: conv3s2_via_s2d(xx, kk))
        g = jax.grad(
            lambda xx, kk: jnp.sum(fwd(xx, kk).astype(jnp.float32)),
            argnums=(0, 1))
        dt = timed(g, (x, k), args.n)
    elif args.exp.startswith("stage1"):
        x = jnp.asarray(rng.rand(args.bs, 256, 256, 48), bf)
        k = jnp.asarray(rng.randn(3, 3, 48, 48) * 0.1, bf)
        if args.exp == "stage1_conv":
            fwd = lambda xx, kk: conv(xx, kk, 1)
        else:
            def fwd(xx, kk):
                pat = jax.lax.conv_general_dilated_patches(
                    xx, (3, 3), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jax.lax.dot_general(
                    pat, kk.reshape(-1, 48), (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        g = jax.grad(
            lambda xx, kk: jnp.sum(fwd(xx, kk).astype(jnp.float32)),
            argnums=(0, 1))
        dt = timed(g, (x, k), args.n)
    elif args.exp.startswith("cba"):
        # ConvBnAct (conv + train-mode BatchNorm + ReLU) at stem3 shape —
        # isolates the BN+glue overhead over the bare conv.
        from robust_object_detection_tpu.models.layers import (ConvBnAct,
                                                               bn_dtype_scope)
        dt = {"cba_bf16bn": bf, "cba_f32bn": jnp.float32}[args.exp]
        x = jnp.asarray(rng.rand(args.bs, 512, 512, 64), bf)
        mod = ConvBnAct(32, 3, 2, act_fn=jax.nn.relu, dtype=bf)
        with bn_dtype_scope(dt):
            v = mod.init(jax.random.key(0), jnp.zeros((1, 32, 32, 64)), True)

        def fwd(params, xx):
            with bn_dtype_scope(dt):
                out, _ = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx, True, mutable=["batch_stats"])
            return out
        g = jax.grad(lambda p, xx: jnp.sum(fwd(p, xx).astype(jnp.float32)),
                     argnums=(0, 1))
        dtm = timed(g, (v["params"], x), args.n)
        print(f"{args.exp}: {dtm*1000:.2f} ms fwd+bwd (bs={args.bs})")
        return
    elif args.exp == "bn_only":
        from flax import linen as fnn
        x = jnp.asarray(rng.rand(args.bs, 512, 512, 32), bf)
        mod = fnn.BatchNorm(use_running_average=False, momentum=0.97,
                            epsilon=1e-3, dtype=bf)
        v = mod.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32)))

        def fwd(params, xx):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, mutable=["batch_stats"])
            return out
        g = jax.grad(lambda p, xx: jnp.sum(fwd(p, xx).astype(jnp.float32)),
                     argnums=(0, 1))
        dtm = timed(g, (v["params"], x), args.n)
        print(f"{args.exp}: {dtm*1000:.2f} ms fwd+bwd (bs={args.bs})")
        return
    elif args.exp.startswith("bgrp"):
        # Batch-folded grouped conv: (B, H, W, C) convs at C << 128 waste
        # lanes (48 -> padded 128 = 2.7x HBM). Reshape batch into channels
        # -> (1, H, W, B*C) with feature_group_count=B: per-image math is
        # identical (groups don't mix), but every tensor fills its lanes.
        cases = {
            "bgrp_stage1": ((args.bs, 256, 256, 48), (3, 3, 48, 48), 1),
            "bgrp_stem3": ((args.bs, 512, 512, 64), (3, 3, 64, 32), 2),
        }
        (bsh, ksh, stride) = cases[args.exp]
        b, h, w, c = bsh
        co = ksh[-1]
        x = jnp.asarray(rng.rand(*bsh), bf)
        k = jnp.asarray(rng.randn(*ksh) * 0.1, bf)

        xf = jnp.asarray(np.transpose(np.asarray(x, np.float32),
                                      (1, 2, 0, 3)).reshape(1, h, w, b * c),
                         bf)     # pre-folded: a real impl folds once per stage

        def fwd(xx, kk):
            kf = jnp.tile(kk, (1, 1, 1, b))     # HWIO, groups tile O
            return jax.lax.conv_general_dilated(
                xx, kf, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b)
        g = jax.grad(
            lambda xx, kk: jnp.sum(fwd(xx, kk).astype(jnp.float32)),
            argnums=(0, 1))
        dt = timed(g, (xf, k), args.n)
    elif args.exp == "stem4_mm":
        x = jnp.asarray(rng.rand(args.bs, 256, 256, 32), bf)
        k = jnp.asarray(rng.randn(32, 48) * 0.1, bf)
        g = jax.grad(
            lambda xx, kk: jnp.sum(jax.lax.dot_general(
                xx, kk, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)),
            argnums=(0, 1))
        dt = timed(g, (x, k), args.n)
    else:
        raise SystemExit("unknown exp")
    print(f"{args.exp}: {dt*1000:.2f} ms fwd+bwd (bs={args.bs})")


if __name__ == "__main__":
    main()
