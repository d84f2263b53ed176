"""Validation-during-training + best-checkpoint-by-mAP selection.

Reference counterparts: the FRCNN trainers run a COCOeval and write
``best.pth`` keyed on val mAP (train_frcnn_baseline.py:198-208) and log
``mAP50``/``mAP50_95`` into history.jsonl (train_frcnn_baseline.py:105-107);
the Ultralytics trainers validate every epoch and keep best-by-fitness
(args.yaml ``val: true``). Here every trainer shares one helper: the same
jitted predict step the eval sweep uses (eval/detector_eval.py) runs over the
val split every ``val_interval`` epochs, the summary lands in history.jsonl,
and ``CheckpointManager.save_best`` keeps the best-mAP50 payload.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional

from ..data import pipeline as pipe
from ..eval import detector_eval
from ..parallel import mesh as mesh_lib


def index_val_samples(data_root: str | Path,
                      layout: str = "coco") -> List[pipe.Sample]:
    """Index the val split of a dataset root; [] when the split is absent
    (synthetic smoke runs often ship train-only roots)."""
    root = Path(data_root)
    try:
        if layout == "coco":
            if not (root / "annotations" / "instances_val.json").exists():
                return []
            return pipe.index_coco(root, "val")
        if not (root / "images" / "val").is_dir():
            return []
        return pipe.index_yolo(root, "val")
    except (FileNotFoundError, NotADirectoryError):
        return []


def run_validation(predict_fn: Callable, state,
                   val_samples: List[pipe.Sample], img_size: int,
                   batch_size: int,
                   ctx: Optional[mesh_lib.MeshContext] = None,
                   max_boxes: int = 600) -> Dict[str, float]:
    """One val pass -> {"mAP50", "mAP50_95"} via the COCOeval-parity scorer."""
    summary = detector_eval.evaluate_on_samples(
        predict_fn, state, val_samples, img_size, batch_size, ctx,
        max_boxes=max_boxes)
    return {"mAP50": round(summary["mAP50"], 5),
            "mAP50_95": round(summary["mAP50_95"], 5)}


def should_validate(epoch: int, epochs: int, val_interval: int,
                    have_val: bool) -> bool:
    """Validate every `val_interval` epochs and always on the final epoch.

    val_interval=0 disables periodic validation but keeps the final pass
    (the reference FRCNN pattern: single COCOeval after the last epoch)."""
    if not have_val:
        return False
    if epoch == epochs:
        return True
    return val_interval > 0 and epoch % val_interval == 0
