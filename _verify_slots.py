"""Part 2/3: RT-DETR decoder on TPU with spatial_sort on/off (shared
params) + grad step through the sorted path. train=False for BN."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from robust_object_detection_tpu.models import rtdetr as R

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

model_on = R.RTDETR(R.RtDetrConfig(num_classes=6, spatial_sort=True),
                    jnp.bfloat16)
model_off = R.RTDETR(R.RtDetrConfig(num_classes=6, spatial_sort=False),
                     jnp.bfloat16)
x = jnp.asarray(rng.random((2, 256, 256, 3)), jnp.float32)
D = 16
dn = {
    "classes": jnp.asarray(rng.integers(-1, 6, (2, D)), jnp.int32),
    "boxes": jnp.asarray(rng.uniform(0.05, 0.95, (2, D, 4)), jnp.float32),
    "group_ids": jnp.asarray(
        np.repeat(np.array([[0, 1, 2, -1]]), D // 4, 1), jnp.int32),
}
params = model_on.init(jax.random.PRNGKey(0), x, False)
t0 = time.time()
out_on = jax.jit(lambda p, x, dn: model_on.apply(p, x, False, dn=dn)
                 )(params, x, dn)
print(f"sorted fwd compile+run {time.time() - t0:.1f}s", flush=True)
out_off = jax.jit(lambda p, x, dn: model_off.apply(p, x, False, dn=dn)
                  )(params, x, dn)
for k in ("logits", "boxes", "dn_logits", "dn_boxes", "enc_logits"):
    a, bb = np.asarray(out_on[k], np.float32), np.asarray(
        out_off[k], np.float32)
    d = np.abs(a - bb).max()
    m = max(1.0, np.abs(bb).max())
    print(f"{k}: max|on-off|={d:.5f} (ref mag {m:.2f})", flush=True)
    assert d < 5e-2 * m, f"spatial_sort changed {k} beyond fp noise"
assert np.isfinite(np.asarray(out_on["logits"], np.float32)).all()
print("spatial_sort on/off parity OK", flush=True)


def train_loss(p):
    o = model_on.apply(p, x, False, dn=dn)
    return sum(jnp.sum(jnp.asarray(v, jnp.float32) ** 2)
               for v in jax.tree.leaves(o)) / 1e6


g = jax.jit(jax.grad(train_loss))(params)
leaves = jax.tree.leaves(g)
gn = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))
nfinite = all(bool(jnp.isfinite(l.astype(jnp.float32)).all())
              for l in leaves)
print(f"grad L1 total={gn:.3e} finite={nfinite} leaves={len(leaves)}",
      flush=True)
assert nfinite and gn > 0
print("MODEL VERIFY CHECKS PASSED", flush=True)
