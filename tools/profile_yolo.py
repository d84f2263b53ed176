"""YOLOv8m train-step profiler: the bench.py headline workload on chip.

Workload = bench.py main(): yolov8m, bs=16, 1024px, augmented (50% random
corruption) + base recipe, bf16 compute + bf16 BN, SGD+EMA. Chained
dispatch + one fetch (tunnel rules — see STATUS.md round-2 notes).

Modes (--mode):
  step     full train step (ledger number)
  trace    capture an xplane device trace of N chained steps into --dir
           (parse with tools/trace_ops.py <dir> <N>)
  fwd      model forward only (train=True)
  fwdbwd   model fwd+bwd, dummy sum-of-outputs loss
  loss     detection loss (TAL assigner + CIoU/BCE/DFL) fwd only
  lossgrad detection loss fwd+bwd
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robust_object_detection_tpu.core.config import CorruptionConfig
from robust_object_detection_tpu.models import yolov8 as Y
from robust_object_detection_tpu.models.layers import bn_dtype_scope
from robust_object_detection_tpu.train import detector as det
from robust_object_detection_tpu.train import detection as DL


def make_batch(bs, img_size, n_gt=80, max_boxes=600, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randint(0, 255, (bs, img_size, img_size, 3),
                                     dtype=np.uint8))
    gb = np.zeros((bs, max_boxes, 4), np.float32)
    gc = np.full((bs, max_boxes), -1, np.int32)
    for i in range(bs):
        xy = rng.rand(n_gt, 2) * (img_size - 100)
        wh = rng.rand(n_gt, 2) * 60 + 8
        gb[i, :n_gt] = np.concatenate([xy, xy + wh], 1)
        gc[i, :n_gt] = rng.randint(0, 6, n_gt)
    return images, jnp.asarray(gb), jnp.asarray(gc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="step")
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--img", type=int, default=1024)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--dir", default="/tmp/jaxtrace_yolo")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = Y.create(6, "m", dtype=dtype)
    tx = optax.sgd(0.01, momentum=0.937, nesterov=True)
    with bn_dtype_scope(dtype):
        state = det.init_state(model, jax.random.key(0), 256, tx)
    images, gb, gc = make_batch(args.bs, args.img)
    key = jax.random.key(1)

    if args.mode in ("step", "trace"):
        with bn_dtype_scope(dtype):
            step = jax.jit(det.make_train_step(
                model, tx, args.img, CorruptionConfig(), augment=True,
                base_augment=True), donate_argnums=(0,))
            s, m = step(state, images, gb, gc, key)
            float(jax.device_get(m["loss"]))          # compile + sync
            if args.mode == "trace":
                jax.profiler.start_trace(args.dir)
            t0 = time.time()
            for _ in range(args.n):
                s, m = step(s, images, gb, gc, key)
            float(jax.device_get(m["loss"]))
            dt = (time.time() - t0) / args.n
            if args.mode == "trace":
                jax.profiler.stop_trace()
                print(f"trace -> {args.dir}")
    elif args.mode in ("fwd", "fwdbwd"):
        x = images.astype(jnp.float32) / 255.0

        def fwd(params, x):
            with bn_dtype_scope(dtype):
                outs, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(outs))
        g = jax.grad(fwd) if args.mode == "fwdbwd" else fwd

        @jax.jit
        def chain(x):
            def body(carry, _):
                out = g(state.params, jax.tree.map(
                    lambda a: a + carry * 1e-30, x))
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(out))
                return s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.n)
            return c
        jax.device_get(chain(x))
        t0 = time.time()
        jax.device_get(chain(x))
        dt = (time.time() - t0) / args.n
    elif args.mode in ("loss", "lossgrad"):
        # head outputs at strides 8/16/32: per-level (box_logits, cls_logits)
        rngf = jax.random.PRNGKey(0)
        nc, reg_max = 6, 16
        feats = []
        for s in (8, 16, 32):
            hw = args.img // s
            feats.append((jax.random.normal(rngf,
                                            (args.bs, hw, hw, 4 * reg_max)),
                          jax.random.normal(rngf, (args.bs, hw, hw, nc))))

        def lf(feats):
            loss, parts = DL.yolo_loss(feats, gb, gc, args.img)
            return loss
        f = (lf if args.mode == "loss" else
             lambda o: sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(jax.grad(lf)(o))))

        @jax.jit
        def chain(feats):
            def body(carry, _):
                f2 = [(feats[0][0] + carry * 1e-30, feats[0][1])] \
                    + list(feats[1:])
                return f(f2) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.n)
            return c
        jax.device_get(chain(feats))
        t0 = time.time()
        jax.device_get(chain(feats))
        dt = (time.time() - t0) / args.n
    else:
        raise SystemExit(f"unknown mode {args.mode}")

    print(f"mode={args.mode} bs={args.bs} img={args.img} dtype={args.dtype}: "
          f"{dt*1000:.1f} ms/step ({args.bs/dt:.1f} img/s)")


if __name__ == "__main__":
    main()
