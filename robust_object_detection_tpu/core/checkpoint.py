"""Orbax checkpointing with restore-and-continue.

The reference writes `last.pth` every epoch and `best.pth` at the best metric
(train_frcnn_baseline.py:196,208; train_restoration.py:289-293) but has no
mid-run resume. Here checkpoints carry the full train state (params, opt
state, step, rng stream counters, best metric) and any run can resume.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax: keeps `last` (rolling) and `best` (by metric)."""

    def __init__(self, out_dir: str | Path, max_to_keep: int = 2):
        self.root = Path(out_dir).absolute() / "ckpt"
        self.root.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.root / "last",
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self._best_dir = self.root / "best"
        self._best_meta = self.root / "best_meta.json"

    # ── rolling `last` ──────────────────────────────────────────────
    def save_last(self, step: int, state: Any, extra: Optional[Dict[str, Any]] = None) -> None:
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        if self._mgr.latest_step() == step:
            # re-save at the same key: an epoch-end save landing on the
            # same global step as an aligned mid-epoch save (save_every_steps
            # dividing steps_per_epoch)
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_last(self, abstract_state: Any,
                     abstract_extra: Optional[Dict[str, Any]] = None,
                     ) -> Optional[Dict[str, Any]]:
        """Restore the rolling checkpoint (None if absent).

        abstract_extra: shape skeleton of the `extra` dict the saver may
        have written (mid-epoch resume metadata). The on-disk layout is
        probed so both directions stay compatible: a legacy epoch-keyed
        checkpoint (no `extra` subtree) restored by new code synthesizes
        `extra` as {epoch: step, epoch_done: True, ...zeros}, and a new
        step-keyed checkpoint restored by an extra-less caller silently
        drops the metadata instead of tripping orbax's tree-structure
        check.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        on_disk_extra = self._extra_skeleton(step)
        target = {"state": _with_default_sharding(abstract_state)}
        if on_disk_extra is not None:
            target["extra"] = (abstract_extra if abstract_extra is not None
                               else on_disk_extra)
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(target))
        if abstract_extra is None:
            restored.pop("extra", None)
        elif on_disk_extra is None:
            # legacy checkpoint: step key WAS the epoch, always epoch-end
            synth = {k: 0 for k in abstract_extra}
            if "epoch" in synth:
                synth["epoch"] = step
            if "epoch_done" in synth:
                synth["epoch_done"] = True
            restored["extra"] = synth
        restored["step"] = step
        return restored

    def _extra_skeleton(self, step: int) -> Optional[Dict[str, Any]]:
        """The on-disk `extra` subtree's restore skeleton, or None.

        Read from the checkpoint's `_METADATA` file directly: the manager's
        `item_metadata` only resolves the handler for checkpoints saved by
        the same instance (fresh managers log "could not be restored" and
        return None), and a restore-only manager is the common case here.
        Keys are orbax's stringified key-paths, e.g. "('extra', 'epoch')".
        """
        import ast
        meta_path = self.root / "last" / str(step) / "default" / "_METADATA"
        try:
            tree_meta = json.loads(meta_path.read_text())["tree_metadata"]
        except (OSError, KeyError, json.JSONDecodeError):
            return None
        extra: Dict[str, Any] = {}
        for key in tree_meta:
            try:
                path = ast.literal_eval(key)
            except (ValueError, SyntaxError):
                continue
            if isinstance(path, tuple) and len(path) == 2 \
                    and path[0] == "extra":
                extra[path[1]] = 0
        return extra or None

    # ── `best` by metric ────────────────────────────────────────────
    def save_best(self, step: int, state: Any, metric: float,
                  mode: str = "max") -> bool:
        prev = self.best_metric()
        improved = (prev is None or
                    (metric > prev if mode == "max" else metric < prev))
        if not improved:
            return False
        ckptr = ocp.StandardCheckpointer()
        # multi-host: primary clears the stale dir, everyone barriers, the
        # save itself is collective (orbax coordinates shard writes); the
        # meta json is a primary-only artifact
        if jax.process_index() == 0 and self._best_dir.exists():
            import shutil
            shutil.rmtree(self._best_dir)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("rod_best_rm")
        ckptr.save(self._best_dir, {"state": state})
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            self._best_meta.write_text(
                json.dumps({"step": step, "metric": metric}))
        return True

    def best_metric(self) -> Optional[float]:
        if not self._best_meta.exists():
            return None
        return json.loads(self._best_meta.read_text())["metric"]

    def restore_best(self, abstract_state: Any) -> Optional[Any]:
        if not self._best_dir.exists():
            return None
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            self._best_dir, {"state": _with_default_sharding(abstract_state)})
        return restored["state"]

    def close(self) -> None:
        self._mgr.close()


def _with_default_sharding(tree: Any) -> Any:
    """Give sharding-less ShapeDtypeStruct leaves a current-topology home.

    A checkpoint saved on one topology (a multi-host pod, a different
    device count) records device ids the restoring host may not have;
    orbax then refuses to infer shardings from the file. Abstract restore
    targets get the local default device so cross-topology restores work
    (save on a pod -> load on one chip). Concrete-array targets keep their
    own shardings (the same-topology resume path)."""
    dev = jax.local_devices()[0]
    s = jax.sharding.SingleDeviceSharding(dev)

    def f(x):
        if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
        return x

    return jax.tree.map(f, tree)


def abstract_like(tree: Any) -> Any:
    """Shape/dtype skeleton of a pytree, for orbax restore targets."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, tree)


def abstract_init(model: Any, img_size: int = 64) -> Any:
    """Shape/dtype skeleton of a Flax model's variable tree via eval_shape.

    Checkpoint-restore targets don't need real values: running `model.init`
    on the accelerator just to learn shapes costs a full init compile plus
    per-tensor device round trips (several seconds through the axon tunnel
    per model). eval_shape derives the identical tree with zero device work;
    orbax then restores straight from disk and the caller moves the result
    to the device in one batched `jax.device_put` (or lets jit do it).
    """
    import jax.numpy as jnp
    return jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, img_size, img_size, 3),
                                     jnp.float32), train=False))
