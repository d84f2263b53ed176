"""Faster R-CNN train-step profiler: the ledger workload on the real chip.

Ledger config: bs=2, 1024px, bf16 compute + bf16 BN, augmented, pretrained
-style frozen backbone OFF by default (pass --trainable 3 to mirror the
--pretrained recipe). Chained dispatch + one fetch (tunnel timing rules —
see STATUS.md round-2 notes).

Modes (--mode):
  step     full train step (ledger number)
  trace    xplane device trace of N chained steps into --dir
           (parse with tools/trace_ops.py <dir> <N>)
  predict  inference step (RPN -> RoI head -> NMS)
  fwd      backbone+FPN+RPN extract only, fwd+bwd with dummy loss
  roi      roi_align fwd+bwd alone on fixed pyramid + random boxes
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robust_object_detection_tpu.core.config import CorruptionConfig
from robust_object_detection_tpu.models import fpn as fpn_lib
from robust_object_detection_tpu.models import frcnn as F
from robust_object_detection_tpu.models.layers import bn_dtype_scope
from robust_object_detection_tpu.train import frcnn as TF


def make_batch(bs, img_size, n_gt=54, max_boxes=600, seed=0):
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
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--img", type=int, default=1024)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--dir", default="/tmp/jaxtrace_frcnn")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--trainable", type=int, default=5)
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = F.FasterRCNN(F.FrcnnConfig(trainable_layers=args.trainable),
                         dtype=dtype)
    tx = optax.sgd(0.005, momentum=0.9)
    with bn_dtype_scope(dtype):
        state = TF.init_state(model, jax.random.key(0), 256, tx)
    images, gb, gc = make_batch(args.bs, args.img)
    key = jax.random.key(1)

    if args.mode in ("step", "trace"):
        with bn_dtype_scope(dtype):
            step = jax.jit(TF.make_train_step(
                model, tx, args.img, CorruptionConfig(), augment=True),
                donate_argnums=(0,))
            s, m = step(state, images, gb, gc, key)
            float(jax.device_get(m["loss"]))
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
    elif args.mode == "predict":
        with bn_dtype_scope(dtype):
            predict = jax.jit(TF.make_predict_step(model, args.img))
            out = predict(state, images)
            jax.device_get(out[1][0, 0])
            t0 = time.time()
            prev = jnp.uint8(0)
            for _ in range(args.n):
                out = predict(state, images + prev)
                prev = (out[1][0, 0] * 0).astype(jnp.uint8)
            jax.device_get(out[1][0, 0])
            dt = (time.time() - t0) / args.n
    elif args.mode == "roi":
        c, sizes = 256, [(256, 256), (128, 128), (64, 64), (32, 32)]
        rng = np.random.RandomState(0)
        pyramid = tuple(jnp.asarray(rng.rand(args.bs, h, w, c), dtype)
                        for h, w in sizes)
        r = 512
        xy = rng.rand(args.bs, r, 2) * 900
        wh = rng.rand(args.bs, r, 2) * 120 + 4
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

        def f(pyr, bx):
            rois = fpn_lib.roi_align(pyr, bx)
            return jnp.sum(rois.astype(jnp.float32))
        g = jax.jit(jax.grad(lambda pyr: f(pyr, boxes)))

        @jax.jit
        def chain(pyr):
            def body(carry, _):
                grads = g(jax.tree.map(lambda a: a + carry, pyr))
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(grads))
                return (s * 1e-20).astype(dtype), ()
            cc, _ = jax.lax.scan(body, jnp.asarray(0, dtype), None,
                                 length=args.n)
            return cc
        jax.device_get(chain(pyramid))
        t0 = time.time()
        jax.device_get(chain(pyramid))
        dt = (time.time() - t0) / args.n
    else:
        raise SystemExit(f"unknown mode {args.mode}")

    print(f"mode={args.mode} bs={args.bs} img={args.img} "
          f"dtype={args.dtype}: {dt*1000:.1f} ms/step "
          f"({args.bs/dt:.1f} img/s)")


if __name__ == "__main__":
    main()
