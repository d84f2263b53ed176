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
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = R.create(6, dtype=dtype)
    tx, _ = TR.make_optimizer()
    scope = bn_dtype_scope(dtype)
    with scope:
        state = TR.init_state(model, jax.random.key(0), 256, tx)
    images, gb, gc = make_batch(args.bs, args.img, args.ngt)
    key = jax.random.key(1)

    if args.mode == "step":
        with bn_dtype_scope(dtype):
            step = jax.jit(TR.make_train_step(
                model, tx, args.img, CorruptionConfig(), augment=True,
                base_augment=True), donate_argnums=(0,))
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
                leaf = jax.tree.leaves(out)[0]
                return jnp.sum(leaf.astype(jnp.float32)) * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.n)
            return c
        jax.device_get(chain(x))              # compile + run once
        t0 = time.time()
        jax.device_get(chain(x))
        dt = (time.time() - t0) / args.n
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
            g = jax.grad(fwd, argnums=(0, 1))   # param + input grads, as
            #                                     the real net needs both

            @jax.jit
            def chain(params, x):
                def body(carry, _):
                    dp, dx = g(params, x + carry * 1e-30)
                    return jnp.sum(dx.astype(jnp.float32)) * 1e-20, ()
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
             lambda o: jax.tree.leaves(jax.grad(lf)(o))[0]
             .astype(jnp.float32).sum())

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
