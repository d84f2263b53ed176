"""Typed configuration system.

The reference configures everything through module-level constants edited in
place (e.g. hyperparams at train_frcnn_baseline.py:21-37, corruption params at
build_corrupted_testsets.py:12-23, checkpoint registries at eval_all.py:46-68).
Here a single tree of frozen dataclasses replaces constant-editing: every
experiment is a value, serialisable to/from JSON, overridable from the CLI.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Mapping, Tuple


# ── Corruption parameters ────────────────────────────────────────────────
# These mirror the reference's keystone invariant: training-time corruption
# parameters must equal testset-generation parameters byte for byte
# (reference: augmentations.py:14-17 == build_corrupted_testsets.py:16-23).
# Having exactly ONE definition makes the invariant structural.

@dataclasses.dataclass(frozen=True)
class CorruptionConfig:
    noise_sigma: float = 15.0
    blur_kernel: int = 9
    blur_angle_deg: float = 0.0
    downscale_factor: float = 0.5
    # Probability that a training sample is corrupted at all
    # (reference: RandomCorruption(p=0.5), augmentations.py:60-74).
    prob: float = 0.5


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset roots and layout (reference: paths.py, build_corrupted_testsets.py:8-10)."""
    visdrone_det_train: str = "data/raw/VisDrone2019-DET-train"
    visdrone_det_val: str = "data/raw/VisDrone2019-DET-val"
    visdrone_vid_train: str = "data/raw/VisDrone2019-VID-train"
    visdrone_vid_val: str = "data/raw/VisDrone2019-VID-val"
    processed_root: str = "data/processed"
    testset_root: str = "data/testsets"
    # Fixed eval resolution: TPU wants static shapes, so eval letterboxes to a
    # square canvas (the reference evaluates Ultralytics models at imgsz=1024,
    # train_yolo_augmented.py:31, and FRCNN at native resolution batch-1,
    # eval_all.py:103).
    image_size: int = 1024
    batch_size: int = 8


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 100
    batch_size: int = 8
    lr: float = 1e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 500
    seed: int = 42
    bf16: bool = True
    # jax.checkpoint (remat) for the backbone to trade FLOPs for HBM.
    remat: bool = False
    checkpoint_every: int = 1
    log_every: int = 50


@dataclasses.dataclass(frozen=True)
class RestorationConfig:
    """Restoration experiment (reference: train_restoration.py:33-48)."""
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    patch_size: int = 256
    epochs: int = 60
    batch_size: int = 8
    lr: float = 1e-3
    weight_decay: float = 1e-4
    lr_min: float = 1e-6
    ssim_weight: float = 0.3
    val_every: int = 5
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map parallelism.

    The reference is single-GPU (SURVEY.md §2.3: no parallelism of any kind);
    here data/model axes are first-class. Axis sizes of 1 disable an axis.
    """
    data: int = -1   # -1 = all remaining devices
    model: int = 1

    def axis_sizes(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices; "
                "set MeshConfig.data/model to factor the device count")
        return data, model


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    conf_threshold: float = 0.001
    iou_threshold: float = 0.7       # NMS IoU
    max_detections: int = 300
    # COCOeval conventions (maxDets=100 for the AP computation itself).
    map_max_dets: int = 100
    image_size: int = 1024
    batch_size: int = 8


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "default"
    out_root: str = "experiments"
    corruption: CorruptionConfig = dataclasses.field(default_factory=CorruptionConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    restoration: RestorationConfig = dataclasses.field(default_factory=RestorationConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    @property
    def out_dir(self) -> Path:
        return Path(self.out_root) / self.name


# ── (De)serialisation ────────────────────────────────────────────────────

def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def _from_mapping(cls: type, m: Mapping[str, Any]) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in m:
            continue
        v = m[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, Mapping):
            v = _from_mapping(f.type, v)
        elif isinstance(v, Mapping) and f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            v = _from_mapping(type(f.default_factory()), v)  # type: ignore[misc]
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def from_dict(m: Mapping[str, Any]) -> ExperimentConfig:
    return _from_mapping(ExperimentConfig, m)


def load(path: str | Path) -> ExperimentConfig:
    return from_dict(json.loads(Path(path).read_text()))


def save(cfg: ExperimentConfig, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(to_dict(cfg), indent=2))


def override(cfg: Any, **updates: Any) -> Any:
    """Functional update: override("train.lr"-style dotted keys not needed —
    nested replace via keyword dicts), e.g.
    ``override(cfg, train={"lr": 3e-4}, name="exp2")``.
    """
    kwargs = {}
    for k, v in updates.items():
        cur = getattr(cfg, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, Mapping):
            v = override(cur, **v)
        kwargs[k] = v
    return dataclasses.replace(cfg, **kwargs)
