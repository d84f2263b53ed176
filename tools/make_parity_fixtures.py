#!/usr/bin/env python
"""Generate external-parity fixtures on a host that has the real artifacts.

This image has neither pycocotools nor the real pretrained checkpoints
(zero egress), so the highest-stakes parity claims — COCOeval semantics and
checkpoint-layout import — verify against transcriptions by the same author
(round-2 verdict, "single-author oracle risk"). Run THIS script on any host
that has the missing pieces, commit the outputs, and
tests/test_external_parity.py validates against them everywhere after:

    # scorer goldens (needs: pip install pycocotools)
    python tools/make_parity_fixtures.py --scorer

    # checkpoint layout manifests (needs the real files, e.g. from
    # Ultralytics/torchvision caches)
    python tools/make_parity_fixtures.py --checkpoints \
        --yolo ~/yolov8m.pt --rtdetr ~/rtdetr-l.pt \
        --frcnn ~/.cache/torch/hub/checkpoints/fasterrcnn_resnet50_fpn_v2_coco-dd69338a.pth

Outputs (commit them):
    tests/fixtures/pycoco_parity.json     — real COCOeval numbers for the
                                            canned eval cases
    tests/fixtures/manifest_<name>.json   — key -> shape manifest of each
                                            real checkpoint's state dict
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXDIR = REPO / "tests" / "fixtures"


def gen_scorer_fixture() -> None:
    from robust_object_detection_tpu.eval import parity_fixtures as pf

    path = pf.write_fixture()
    print(f"wrote {path}")
    # immediately check our scorer against what we just generated
    fixture = pf.load_fixture()
    for case in fixture["cases"]:
        det, gt = pf.make_canned_eval_case(case["seed"])
        ours = pf.our_stats(det, gt)
        for k, v in case["pycocotools"].items():
            d = abs(ours[k] - v)
            flag = "" if d < 1e-9 else f"  <-- DIFF {d:.2e}"
            print(f"  seed {case['seed']} {k}: ours={ours[k]:.6f} "
                  f"pycoco={v:.6f}{flag}")


def gen_manifest(name: str, path: str) -> None:
    """Dump {key: shape} for a real torch checkpoint's state dict."""
    from robust_object_detection_tpu.models import pretrained as pt

    sd = pt.load_checkpoint_state(path, allow_pickle=True)
    payload = {"name": name, "source": str(path),
               "tensors": {k: list(v.shape) for k, v in sorted(sd.items())}}
    out = FIXDIR / f"manifest_{name}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {out} ({len(payload['tensors'])} tensors)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scorer", action="store_true",
                    help="generate pycocotools scorer goldens")
    ap.add_argument("--checkpoints", action="store_true",
                    help="generate checkpoint layout manifests")
    ap.add_argument("--yolo", help="path to real yolov8m.pt")
    ap.add_argument("--rtdetr", help="path to real rtdetr-l.pt")
    ap.add_argument("--frcnn",
                    help="path to real fasterrcnn_resnet50_fpn_v2 .pth")
    args = ap.parse_args()
    if not (args.scorer or args.checkpoints):
        ap.error("pass --scorer and/or --checkpoints")
    if args.scorer:
        gen_scorer_fixture()
    if args.checkpoints:
        any_ckpt = False
        for name, p in (("yolov8m", args.yolo), ("rtdetr-l", args.rtdetr),
                        ("frcnn_v2", args.frcnn)):
            if p:
                gen_manifest(name, p)
                any_ckpt = True
        if not any_ckpt:
            ap.error("--checkpoints needs at least one of "
                     "--yolo/--rtdetr/--frcnn")


if __name__ == "__main__":
    main()
