"""2-process jax.distributed smoke test on the CPU backend (VERDICT r3 #6;
SURVEY.md §2.3's DCN follow-on — the reference is single-process CUDA).

Coordinator on localhost; each process brings 2 virtual CPU devices, so
the global mesh is 4-wide data parallel across 2 processes. The detector
trainer runs one epoch end-to-end: per-process sample shards + local batch
slices assembled into global arrays (make_array_from_process_local_data),
collective orbax saves, primary-only JSON artifacts.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

DRIVER = """
import json, sys
from pathlib import Path
import jax
# same hard override as tests/conftest.py: the image's sitecustomize
# registers the axon TPU plugin, which ignores the env-var platform choice
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from robust_object_detection_tpu.parallel import distributed as dist
assert dist.maybe_initialize(), "env contract not picked up"
from robust_object_detection_tpu.core.config import (ExperimentConfig,
                                                     MeshConfig, TrainConfig)
from robust_object_detection_tpu.train import detector

root = Path(sys.argv[1])
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.devices()
assert jax.local_device_count() == 2
cfg = ExperimentConfig(train=TrainConfig(seed=0),
                       mesh=MeshConfig(data=4, model=1))
r = detector.train(cfg, root / "coco", root / "run", augment=False,
                   variant="n", epochs=1, img_size=64, batch_size=4,
                   max_boxes=16, mosaic=False, base_augment=False)
if dist.is_primary():
    (root / "result.json").write_text(json.dumps(r))
print("proc", jax.process_index(), "done", r["steps"], r["final_loss"])
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_detector_train(tmp_path):
    from robust_object_detection_tpu.data import convert, synthetic

    det = synthetic.make_det_split(tmp_path / "det", n_images=8,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp_path / "coco", "train")
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    repo_root = str(Path(__file__).resolve().parents[1])
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=repo_root + os.pathsep + os.environ.get(
                "PYTHONPATH", ""),
            ROD_COORDINATOR=f"localhost:{port}",
            ROD_NUM_PROCESSES="2",
            ROD_PROCESS_ID=str(pid))
        # don't register the axon TPU plugin in the workers: two extra
        # processes dialing the single-chip tunnel would contend with it
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(driver), str(tmp_path)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{o[-4000:]}"

    r = json.loads((tmp_path / "result.json").read_text())
    assert r["steps"] == 2              # 8 images / global batch 4
    # primary-only artifacts, written exactly once
    hist = [json.loads(l) for l in
            (tmp_path / "run" / "history.jsonl").read_text().splitlines()]
    assert [h["epoch"] for h in hist] == [1]
    assert (tmp_path / "run" / "config.json").exists()
    # the collective checkpoint landed and is loadable single-process
    from robust_object_detection_tpu.train import detector
    model, state = detector.load_checkpoint(tmp_path / "run", variant="n",
                                            img_size=64)
    assert state.params is not None
