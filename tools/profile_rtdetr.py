"""RT-DETR train-step profiler: component ablation on the real chip.

Measures the ledger workload (bs=8, 1024px, augmented + CDN, realistic
80 GTs/img) with CHAINED dispatch and one final fetch (block_until_ready
is unreliable through the axon tunnel; a chain bounded by a device_get of
the last step's loss is the honest clock — see STATUS.md round-2 notes).

Modes (--mode):
  step      full train step (ledger number)
  fwd       model forward only (train=True, incl. batch_stats mutation)
  fwdbwd    model fwd + bwd with a dummy scalar loss (sum of all outputs)
  loss      rtdetr_loss fwd only (matcher + losses) on fixed activations
  lossgrad  rtdetr_loss fwd+bwd
  backbone  HGNetv2 backbone fwd+bwd alone
  noloss    full step but loss replaced by sum-of-outputs (isolates
            matcher+loss cost inside the real step, with optimizer)
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robust_object_detection_tpu.core.config import CorruptionConfig
from robust_object_detection_tpu.models import rtdetr as R
from robust_object_detection_tpu.models.layers import bn_dtype_scope
from robust_object_detection_tpu.train import rtdetr as TR


def make_batch(bs, img_size, n_gt, max_boxes=600, seed=0):
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


def timeit(fn, state, args, n, fetch):
    """Chained dispatch: state_{k+1} = fn(state_k, ...); fetch at end."""
    s = fn(state, *args)
    jax.device_get(fetch(s))                     # compile + sync
    t0 = time.time()
    s2 = s
    for _ in range(n):
        s2 = fn(s2, *args)
    jax.device_get(fetch(s2))
    return (time.time() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="step")
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--img", type=int, default=1024)
    p.add_argument("--ngt", type=int, default=80)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dir", default="/tmp/jaxtrace_rtdetr")
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = R.create(6, dtype=dtype)
    tx, _ = TR.make_optimizer()
    scope = bn_dtype_scope(dtype)
    with scope:
        state = TR.init_state(model, jax.random.key(0), 256, tx)
    images, gb, gc = make_batch(args.bs, args.img, args.ngt)
    key = jax.random.key(1)

    if args.mode in ("step", "trace"):
        with bn_dtype_scope(dtype):
            step = jax.jit(TR.make_train_step(
                model, tx, args.img, CorruptionConfig(), augment=True,
                base_augment=True), donate_argnums=(0,))
            if args.mode == "trace":
                import time as _t
                s, m = step(state, images, gb, gc, key)
                float(jax.device_get(m["loss"]))      # compile + sync
                jax.profiler.start_trace(args.dir)
                t0 = _t.time()
                for _ in range(args.n):
                    s, m = step(s, images, gb, gc, key)
                float(jax.device_get(m["loss"]))
                dt = (_t.time() - t0) / args.n
                jax.profiler.stop_trace()
                print(f"trace -> {args.dir}")
            else:
                dt = timeit(lambda s, *a: step(s, *a)[0], state,
                            (images, gb, gc, key), args.n,
                            lambda s: s.params["dec_score_head_0"]["Dense_0"]
                            ["bias"] if "dec_score_head_0" in s.params else
                            jax.tree.leaves(s.params)[0])
    elif args.mode == "noloss":
        with bn_dtype_scope(dtype):
            def step(state, images_u8, key):
                x = images_u8.astype(jnp.float32) / 255.0

                def loss_fn(params):
                    outs, mut = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        x, train=True, mutable=["batch_stats"])
                    loss = sum(jnp.sum(v.astype(jnp.float32)) * 1e-9
                               for v in jax.tree.leaves(
                                   {k: outs[k] for k in
                                    ("logits", "boxes", "enc_logits",
                                     "enc_boxes")}))
                    return loss, mut["batch_stats"]

                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
                return TR.RtdetrTrainState(new_params, new_stats,
                                           state.ema_params, new_opt,
                                           state.step + 1)
            stepj = jax.jit(step, donate_argnums=(0,))
            dt = timeit(stepj, state, (images, key), args.n,
                        lambda s: jax.tree.leaves(s.params)[0])
    elif args.mode in ("fwd", "fwdbwd", "backbone", "encoder"):
        x = images.astype(jnp.float32) / 255.0
        if args.mode == "backbone":
            bb = R.HGNetV2L(dtype)
            with bn_dtype_scope(dtype):
                bvars = bb.init(jax.random.key(0),
                                jnp.zeros((1, 256, 256, 3)), True)
            bstats = bvars["batch_stats"]

            def fwd(params, x):
                with bn_dtype_scope(dtype):
                    feats, mut = bb.apply(
                        {"params": params, "batch_stats": bstats},
                        x, True, mutable=["batch_stats"])
                return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
            state = type("S", (), {"params": bvars["params"],
                                   "batch_stats": bstats})()
        elif args.mode == "encoder":
            # HybridEncoder (AIFI + CCFF RepC3 stack) fwd+bwd on
            # backbone-shaped features. The features are passed as jit
            # ARGUMENTS — closing over them bakes ~0.5 GB of constants
            # into the HLO (the remote-compile endpoint rejects it).
            enc = R.HybridEncoder(R.RtDetrConfig(num_classes=6), dtype)
            s = args.img // 8
            rngf = np.random.RandomState(1)
            x = tuple(
                jnp.asarray(rngf.rand(args.bs, s // (2 ** i), s // (2 ** i),
                                      ch).astype(np.float32))
                for i, ch in enumerate((512, 1024, 2048)))
            with bn_dtype_scope(dtype):
                evars = enc.init(
                    jax.random.key(0),
                    tuple(f[:1, :32 // (2 ** i), :32 // (2 ** i)]
                          for i, f in enumerate(x)), True)
            estats = evars["batch_stats"]

            def fwd(params, feats):
                with bn_dtype_scope(dtype):
                    outs, mut = enc.apply(
                        {"params": params, "batch_stats": estats},
                        feats, True, mutable=["batch_stats"])
                return sum(jnp.sum(f.astype(jnp.float32)) for f in outs)
            state = type("S", (), {"params": evars["params"],
                                   "batch_stats": estats})()
        else:
            def fwd(params, x):
                with bn_dtype_scope(dtype):
                    outs, _ = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        x, train=True, mutable=["batch_stats"])
                return sum(jnp.sum(outs[k].astype(jnp.float32)) for k in
                           ("logits", "boxes", "enc_logits", "enc_boxes"))
        # Chain N iterations INSIDE one jit via lax.scan: a scalar carry
        # perturbs x each step so XLA cannot dedup/DCE, and the tunnel is
        # charged exactly one dispatch + one fetch for the whole chain
        # (eager chaining ops outside jit cost ~45-95 ms/iter through
        # axon and silently dominated earlier readings).
        g = jax.grad(fwd) if args.mode != "fwd" else fwd

        @jax.jit
        def chain(x):
            def body(carry, _):
                xp = jax.tree.map(lambda a: a + carry * 1e-30, x)
                out = g(state.params, xp)
                # sum EVERY grad leaf — touching only one lets XLA DCE
                # the other weight-grad matmuls (the r2 dedup trap)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(out))
                return s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.n)
            return c
        jax.device_get(chain(x))              # compile + run once
        t0 = time.time()
        jax.device_get(chain(x))
        dt = (time.time() - t0) / args.n
    elif args.mode == "stemops":
        # Decompose HGStem: time each sub-op fwd+bwd separately.
        from robust_object_detection_tpu.models.layers import ConvBnAct
        s = args.img
        ops = [
            ("stem1 3x3s2 3->32 @%d" % s,
             R.ConvBnAct if False else ConvBnAct,
             dict(features=32, kernel=3, stride=2, act_fn=jax.nn.relu,
                  dtype=dtype), (s, s, 3), False),
            ("stem2a 2x2 32->16 @%d" % (s // 2), R.Conv2x2Pad,
             dict(features=16, dtype=dtype), (s // 2, s // 2, 32), True),
            ("stem2b 2x2 16->32 @%d" % (s // 2), R.Conv2x2Pad,
             dict(features=32, dtype=dtype), (s // 2, s // 2, 16), True),
            ("pool 2x2s1 @%d" % (s // 2), None, None,
             (s // 2, s // 2, 32), True),
            ("stem3 3x3s2 64->32 @%d" % (s // 2), ConvBnAct,
             dict(features=32, kernel=3, stride=2, act_fn=jax.nn.relu,
                  dtype=dtype), (s // 2, s // 2, 64), True),
            ("stem4 1x1 32->48 @%d" % (s // 4), ConvBnAct,
             dict(features=48, kernel=1, act_fn=jax.nn.relu, dtype=dtype),
             (s // 4, s // 4, 32), True),
        ]
        rngs = np.random.RandomState(0)
        for name, cls, kw, shp, need_dx in ops:
            x = jnp.asarray(rngs.rand(args.bs, *shp).astype(np.float32))
            if cls is None:
                def fwd(params, x):
                    b = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                    from flax import linen as fnn
                    y = fnn.max_pool(b, (2, 2), strides=(1, 1),
                                     padding="VALID")
                    return jnp.sum(y.astype(jnp.float32))
                params = {}
            else:
                mod = cls(**kw)
                with bn_dtype_scope(dtype):
                    v = mod.init(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, shp[-1])), True)

                def fwd(params, x, mod=mod,
                        stats=v.get("batch_stats", {})):
                    with bn_dtype_scope(dtype):
                        out, _ = mod.apply(
                            {"params": params, "batch_stats": stats},
                            x, True, mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32))
                params = v["params"]
            g = jax.grad(fwd, argnums=(0, 1) if need_dx else (0,))

            @jax.jit
            def chain(params, x, g=g):
                def body(carry, _):
                    grads = g(params, x + carry * 1e-30)
                    sm = sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree.leaves(grads))
                    return sm * 1e-20, ()
                c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=args.n)
                return c
            jax.device_get(chain(params, x))
            t0 = time.time()
            jax.device_get(chain(params, x))
            dt_s = (time.time() - t0) / args.n
            print(f"  {name}: {dt_s*1000:.2f} ms fwd+bwd (bs={args.bs})")
        return
    elif args.mode == "stemcut":
        # Cumulative-prefix bisection of HGStem IN-GRAPH: where does the
        # composed cost live (isolated op sums don't explain it).
        from robust_object_detection_tpu.models.layers import ConvBnAct
        from flax import linen as fnn

        from typing import Any as _Any

        class StemPrefix(fnn.Module):
            upto: int
            dtype2: _Any

            @fnn.compact
            def __call__(self, x, train=False):
                d = self.dtype2
                x = ConvBnAct(32, 3, 2, act_fn=jax.nn.relu, dtype=d,
                              name="stem1")(x, train)
                if self.upto == 1:
                    return x
                a = R.Conv2x2Pad(16, dtype=d, name="stem2a")(x, train)
                a = R.Conv2x2Pad(32, dtype=d, name="stem2b")(a, train)
                if self.upto == 2:
                    return a
                bh, hh, ww, cc = x.shape
                bp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                b = jnp.maximum(
                    jnp.maximum(bp[:, :hh, :ww], bp[:, 1:, :ww]),
                    jnp.maximum(bp[:, :hh, 1:], bp[:, 1:, 1:]))
                x = jnp.concatenate([b, a], -1)
                if self.upto == 3:
                    return x
                x = ConvBnAct(32, 3, 2, act_fn=jax.nn.relu, dtype=d,
                              name="stem3")(x, train)
                if self.upto == 4:
                    return x
                return ConvBnAct(48, 1, act_fn=jax.nn.relu, dtype=d,
                                 name="stem4")(x, train)

        x0 = jnp.asarray(np.random.RandomState(0).rand(
            args.bs, args.img, args.img, 3).astype(np.float32))
        for upto in (1, 2, 3, 4, 5):
            mod = StemPrefix(upto, dtype)
            with bn_dtype_scope(dtype):
                v = mod.init(jax.random.key(0),
                             jnp.zeros((1, 64, 64, 3)), True)

            def fwd(params, xx, mod=mod, stats=v.get("batch_stats", {})):
                with bn_dtype_scope(dtype):
                    out, _ = mod.apply(
                        {"params": params, "batch_stats": stats}, xx, True,
                        mutable=["batch_stats"])
                return out
            g = jax.grad(lambda p, xx: jnp.sum(
                fwd(p, xx).astype(jnp.float32)), argnums=(0,))

            @jax.jit
            def chain(params, xx, g=g):
                def body(carry, _):
                    grads = g(params, xx + (carry * 1e-30)
                              .astype(xx.dtype))
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(grads))
                    return s * 1e-20, ()
                c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=args.n)
                return c
            jax.device_get(chain(v["params"], x0))
            t0 = time.time()
            jax.device_get(chain(v["params"], x0))
            dt_s = (time.time() - t0) / args.n
            print(f"  stem upto {upto}: {dt_s*1000:.1f} ms fwd+bwd "
                  f"(bs={args.bs})")
        return
    elif args.mode == "bbstages":
        # Per-stage backbone fwd+bwd: each stage timed as its own chained
        # jitted grad fn on correctly-shaped random inputs.
        from flax import linen as nn

        s = args.img
        stages = [
            ("stem", R.HGStem(32, 48, dtype), (s, s, 3)),
            ("stage1", R.HGBlock(48, 128, 3, light=False, dtype=dtype),
             (s // 4, s // 4, 48)),
            ("ds1", None, None),   # placeholder; depthwise ds below
            ("stage2", R.HGBlock(96, 512, 3, light=False, dtype=dtype),
             (s // 8, s // 8, 128)),
            ("stage3x1", R.HGBlock(192, 1024, 5, light=True, dtype=dtype),
             (s // 16, s // 16, 512)),
            ("stage4", R.HGBlock(384, 2048, 5, light=True, dtype=dtype),
             (s // 32, s // 32, 1024)),
        ]
        from robust_object_detection_tpu.models.layers import ConvBnAct
        stages[2] = ("ds1(dw)", ConvBnAct(128, 3, 2, groups=128, act=False,
                                          dtype=dtype),
                     (s // 4, s // 4, 128))
        rngs = np.random.RandomState(0)
        for name, mod, shp in stages:
            x = jnp.asarray(rngs.rand(args.bs, *shp).astype(np.float32))
            with bn_dtype_scope(dtype):
                small = tuple(min(d, 64) if i < 2 else d
                              for i, d in enumerate(shp))
                v = mod.init(jax.random.key(0), jnp.zeros((1, *small)), True)

            def fwd(params, x, mod=mod, stats=v.get("batch_stats", {})):
                with bn_dtype_scope(dtype):
                    out, _ = mod.apply(
                        {"params": params, "batch_stats": stats}, x, True,
                        mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            # the stem never needs d/dimage in the real net (the image is
            # a constant w.r.t. params); every later stage does need its
            # input gradient (it feeds the previous stage's param grads)
            g = jax.grad(fwd, argnums=(0,) if name == "stem" else (0, 1))

            @jax.jit
            def chain(params, x):
                def body(carry, _):
                    grads = g(params, x + carry * 1e-30)
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(grads))
                    return s * 1e-20, ()
                c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=args.n)
                return c
            jax.device_get(chain(v["params"], x))
            t0 = time.time()
            jax.device_get(chain(v["params"], x))
            dt_s = (time.time() - t0) / args.n
            # stage3 runs 3 similar blocks in the real net
            print(f"  {name}: {dt_s*1000:.1f} ms fwd+bwd (bs={args.bs})")
        return
    elif args.mode in ("loss", "lossgrad"):
        lyr, q, nc = 6, 300, 6
        rng = jax.random.PRNGKey(0)
        outs = {
            "logits": jax.random.normal(rng, (lyr, args.bs, q, nc)),
            "boxes": jax.nn.sigmoid(
                jax.random.normal(rng, (lyr, args.bs, q, 4))),
            "enc_logits": jax.random.normal(rng, (args.bs, q, nc)),
            "enc_boxes": jax.nn.sigmoid(
                jax.random.normal(rng, (args.bs, q, 4))),
        }
        def lf(outs):
            loss, _ = TR.rtdetr_loss(outs, gb, gc, args.img)
            return loss
        f = (lf if args.mode == "loss" else
             lambda o: sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(jax.grad(lf)(o))))

        @jax.jit
        def chain(outs):
            def body(carry, _):
                o2 = dict(outs, enc_logits=outs["enc_logits"]
                          + carry * 1e-30)
                return f(o2) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.n)
            return c
        jax.device_get(chain(outs))
        t0 = time.time()
        jax.device_get(chain(outs))
        dt = (time.time() - t0) / args.n
    else:
        raise SystemExit(f"unknown mode {args.mode}")

    print(f"mode={args.mode} bs={args.bs} img={args.img} ngt={args.ngt} "
          f"dtype={args.dtype}: {dt*1000:.1f} ms/step "
          f"({args.bs/dt:.1f} img/s)")


if __name__ == "__main__":
    main()
