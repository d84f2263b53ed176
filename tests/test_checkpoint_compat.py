"""Checkpoint format compatibility across the mid-epoch-resume change.

The r4 mid-epoch resume feature added an `extra` metadata subtree to the
rolling `last` checkpoint (train/detector.py save_last extra=...). Restores
must stay compatible in BOTH directions (ADVICE r4: pre-change checkpoints
made restore raise on the orbax tree-structure mismatch):

  * legacy epoch-keyed checkpoint (no `extra`) + extra-aware caller ->
    synthesized {epoch: step, epoch_done: True, batch_in_epoch: 0}
  * new step-keyed checkpoint (with `extra`) + extra-less caller (the
    rtdetr/frcnn trainers, ad-hoc tooling) -> metadata silently dropped
"""

import jax.numpy as jnp
import numpy as np

from robust_object_detection_tpu.core.checkpoint import (CheckpointManager,
                                                         abstract_like)

STATE = {"w": jnp.arange(4.0).reshape(2, 2), "step": jnp.asarray(3)}
EXTRA_SKEL = {"epoch": 0, "batch_in_epoch": 0, "epoch_done": True}


def test_extra_checkpoint_restored_by_extraless_caller(tmp_path):
    m = CheckpointManager(tmp_path)
    m.save_last(5, STATE, extra={"epoch": 2, "batch_in_epoch": 7,
                                 "epoch_done": False})
    m.close()
    m2 = CheckpointManager(tmp_path)      # fresh manager: restore-only path
    r = m2.restore_last(abstract_like(STATE))
    m2.close()
    assert "extra" not in r
    assert r["step"] == 5
    np.testing.assert_allclose(np.asarray(r["state"]["w"]),
                               np.arange(4.0).reshape(2, 2))


def test_extra_checkpoint_roundtrip(tmp_path):
    m = CheckpointManager(tmp_path)
    m.save_last(5, STATE, extra={"epoch": 2, "batch_in_epoch": 7,
                                 "epoch_done": False})
    m.close()
    m2 = CheckpointManager(tmp_path)
    r = m2.restore_last(abstract_like(STATE), abstract_extra=EXTRA_SKEL)
    m2.close()
    assert dict(r["extra"]) == {"epoch": 2, "batch_in_epoch": 7,
                                "epoch_done": False}


def test_legacy_checkpoint_restored_by_extra_aware_caller(tmp_path):
    m = CheckpointManager(tmp_path)
    m.save_last(9, STATE)                 # pre-r4: step key IS the epoch
    m.close()
    m2 = CheckpointManager(tmp_path)
    r = m2.restore_last(abstract_like(STATE), abstract_extra=EXTRA_SKEL)
    m2.close()
    assert r["extra"] == {"epoch": 9, "batch_in_epoch": 0,
                          "epoch_done": True}
    r2_mgr = CheckpointManager(tmp_path)
    r2 = r2_mgr.restore_last(abstract_like(STATE))
    r2_mgr.close()
    assert "extra" not in r2 and r2["step"] == 9
