"""Pretrained-checkpoint import parity (models/pretrained.py).

The reference starts every detector from pretrained torch weights
(train_frcnn_baseline.py:139, train_yolo_augmented.py:25,
train_rtdetr_augmented.py:25). These tests build pure-torch replicas whose
``state_dict()`` key layout matches the real checkpoints and assert the
mapped Flax model reproduces the torch forward outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robust_object_detection_tpu.models import pretrained  # noqa: E402
from robust_object_detection_tpu.models import yolov8 as Y  # noqa: E402

pytestmark = pytest.mark.slow    # compiles jitted train steps on the CPU mesh


def _torch_state(model):
    return {k: v.detach().numpy()
            for k, v in model.state_dict().items()}


class TestYoloImport:

    @pytest.fixture(scope="class")
    def pair(self):
        from tests._torch_yolo import DetectionModel, randomize
        tm = randomize(DetectionModel(nc=6, variant="n"))
        fm = Y.create(6, "n")
        fv = Y.init_variables(fm, jax.random.key(0), 64)
        # self.model container => keys already look like model.0.conv.weight
        state = _torch_state(tm)
        fv2, report = pretrained.import_yolov8(state, fv, variant="n")
        return tm, fm, fv2, report

    def test_all_tensors_consumed(self, pair):
        _, _, _, report = pair
        assert not report.skipped

    def test_forward_parity(self, pair):
        tm, fm, fv2, _ = pair
        rng = np.random.RandomState(3)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            touts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        fouts = fm.apply(fv2, jnp.asarray(x), train=False)
        for (tb, tc), (fb, fc) in zip(touts, fouts):
            np.testing.assert_allclose(
                np.asarray(fb), tb.numpy().transpose(0, 2, 3, 1),
                atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(
                np.asarray(fc), tc.numpy().transpose(0, 2, 3, 1),
                atol=2e-4, rtol=1e-3)

    def test_head_mismatch_partial_import(self):
        """COCO-80 checkpoint onto an nc=6 model: cls out convs skipped,
        everything else imported (the Ultralytics transfer behaviour)."""
        from tests._torch_yolo import DetectionModel, randomize
        tm80 = randomize(DetectionModel(nc=80, variant="n"))
        fm = Y.create(6, "n")
        fv = Y.init_variables(fm, jax.random.key(0), 64)
        state = _torch_state(tm80)
        with pytest.raises(ValueError):
            pretrained.import_yolov8(state, fv, variant="n")
        fv2, report = pretrained.import_yolov8(state, fv, variant="n",
                                               strict_head=False)
        # variant n: c3 = max(64, 80) widens the whole cls branch ->
        # 3 blocks x 3 levels skipped
        assert len(report.skipped) == 9
        # backbone weights actually moved
        a = fv["params"]["Backbone_0"]["ConvBnAct_0"]["Conv_0"]["kernel"]
        b = fv2["params"]["Backbone_0"]["ConvBnAct_0"]["Conv_0"]["kernel"]
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestFrcnnImport:

    @pytest.fixture(scope="class")
    def pair(self):
        from robust_object_detection_tpu.models import frcnn as F
        from tests._torch_frcnn import FasterRCNN, randomize
        tm = randomize(FasterRCNN(num_classes=7))
        # normalize=False: the torch replica has no GeneralizedRCNNTransform,
        # so tensor parity is checked transform-free (the protocol-level
        # test covers the normalised path)
        fm = F.FasterRCNN(F.FrcnnConfig(num_proposals=8, normalize=False))
        fv = fm.init(jax.random.key(0),
                     jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
        state = {k: v.numpy() for k, v in
                 tm.state_dict_torchvision().items()}
        fv2, report = pretrained.import_frcnn(state, fv)
        return tm, fm, fv2, report

    def test_all_tensors_consumed(self, pair):
        _, _, _, report = pair
        assert not report.skipped

    def test_pyramid_and_rpn_parity(self, pair):
        tm, fm, fv2, _ = pair
        rng = np.random.RandomState(5)
        x = rng.rand(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            pyr_t, objs_t, boxes_t, _, _ = tm.forward_parts(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.zeros(1, 256, 7, 7))
        pyr_f, obj_f, deltas_f = fm.apply(fv2, jnp.asarray(x), train=False,
                                          method=fm.extract)
        for tp, fp in zip(pyr_t, pyr_f):
            np.testing.assert_allclose(
                np.asarray(fp), tp.numpy().transpose(0, 2, 3, 1),
                atol=5e-4, rtol=1e-3)
        obj_t = np.concatenate(
            [o.numpy().transpose(0, 2, 3, 1).reshape(1, -1)
             for o in objs_t], 1)
        np.testing.assert_allclose(np.asarray(obj_f), obj_t, atol=5e-4,
                                   rtol=1e-3)
        d_t = np.concatenate(
            [b.numpy().transpose(0, 2, 3, 1).reshape(1, -1, 4)
             for b in boxes_t], 1)
        np.testing.assert_allclose(np.asarray(deltas_f), d_t, atol=5e-4,
                                   rtol=1e-3)

    def test_box_head_parity(self, pair):
        tm, fm, fv2, _ = pair
        rng = np.random.RandomState(6)
        rois = rng.rand(1, 8, 7, 7, 256).astype(np.float32)
        with torch.no_grad():
            _, _, _, s_t, d_t = tm.forward_parts(
                torch.zeros(1, 3, 64, 64),
                torch.from_numpy(rois[0].transpose(0, 3, 1, 2)))
        s_f, d_f = fm.apply(fv2, None, jnp.asarray(rois), train=False,
                            method=fm.roi_forward_pooled)
        np.testing.assert_allclose(np.asarray(s_f[0]), s_t.numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(d_f[0]).reshape(8, -1), d_t.numpy(),
            atol=5e-4, rtol=1e-3)

    def test_coco91_partial_import(self):
        from robust_object_detection_tpu.models import frcnn as F
        from tests._torch_frcnn import FasterRCNN, randomize
        tm = randomize(FasterRCNN(num_classes=91))
        fm = F.FasterRCNN(F.FrcnnConfig(num_proposals=8))
        fv = fm.init(jax.random.key(0),
                     jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
        state = {k: v.numpy() for k, v in
                 tm.state_dict_torchvision().items()}
        fv2, report = pretrained.import_frcnn(state, fv,
                                              strict_head=False)
        assert len(report.skipped) == 2        # cls_score + bbox_pred


class TestRtdetrImport:

    @pytest.fixture(scope="class")
    def pair(self):
        from robust_object_detection_tpu.models import rtdetr as R
        from tests._torch_rtdetr import RTDETRModel, randomize
        tm = randomize(RTDETRModel(nc=6))
        fm = R.create(6)
        fv = R.init_variables(fm, jax.random.key(0), 64)
        state = _torch_state(tm)           # keys already model.{i}.*
        fv2, report = pretrained.import_rtdetr(state, fv)
        return tm, fm, fv2, report

    def test_all_tensors_consumed(self, pair):
        _, _, _, report = pair
        assert not report.skipped

    @staticmethod
    def _assert_query_sets_match(f_logits, f_boxes, t_logits, t_boxes,
                                 atol):
        """Query-set comparison: the encoder top-k order depends on ties
        between near-equal scores (f32 noise flips the sort), and the
        decoder is permutation-equivariant, so outputs match as SETS of
        (logits, boxes) rows under a per-image bijection."""
        for b in range(f_logits.shape[0]):
            fr = np.concatenate([f_logits[b], f_boxes[b]], -1)
            tr = np.concatenate([t_logits[b], t_boxes[b]], -1)
            dist = np.abs(fr[:, None] - tr[None]).max(-1)   # (Q, Q)
            col = dist.argmin(1)
            assert len(set(col.tolist())) == len(col), "not a bijection"
            assert dist[np.arange(len(col)), col].max() < atol, (
                dist[np.arange(len(col)), col].max())

    def test_forward_parity(self, pair):
        """Eval forward through the ENTIRE model — backbone (incl. 2x2
        stem), AIFI, CCFF, query selection, 6 deformable decoder layers —
        must match torch (64px: every anchor valid, so the topk paths
        agree up to ties)."""
        tm, fm, fv2, _ = pair
        rng = np.random.RandomState(11)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            enc_l, enc_b, dec_l, dec_b = tm(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = fm.apply(fv2, jnp.asarray(x), train=False)
        self._assert_query_sets_match(
            np.asarray(out["enc_logits"]), np.asarray(out["enc_boxes"]),
            enc_l.numpy(), enc_b.numpy(), atol=2e-3)
        for li in range(len(dec_l)):
            self._assert_query_sets_match(
                np.asarray(out["logits"][li]),
                np.asarray(out["boxes"][li]),
                dec_l[li].numpy(), dec_b[li].numpy(), atol=5e-3)

    def test_coco_partial_import(self):
        from robust_object_detection_tpu.models import rtdetr as R
        from tests._torch_rtdetr import RTDETRModel, randomize
        tm80 = randomize(RTDETRModel(nc=80))
        fm = R.create(6)
        fv = R.init_variables(fm, jax.random.key(0), 64)
        fv2, report = pretrained.import_rtdetr(
            _torch_state(tm80), fv, strict_head=False)
        # skipped: enc_score, 6 dec_score heads, dn embedding
        assert len(report.skipped) == 8


def test_load_checkpoint_state_plain_and_wrapped(tmp_path):
    w = {"layer.weight": torch.randn(3, 3)}
    p1 = tmp_path / "plain.pth"
    torch.save(w, p1)
    s1 = pretrained.load_checkpoint_state(str(p1))
    assert list(s1) == ["layer.weight"] and s1["layer.weight"].shape == (3, 3)

    p2 = tmp_path / "wrapped.pth"
    torch.save({"model": w, "epoch": 3}, p2)
    s2 = pretrained.load_checkpoint_state(str(p2))
    assert list(s2) == ["layer.weight"]


def test_load_checkpoint_state_module_payload(tmp_path):
    """Ultralytics-style checkpoint: {"model": nn.Module}. weights_only
    load fails -> explicit allow_pickle opt-in required."""
    m = torch.nn.Conv2d(3, 4, 1)
    p = tmp_path / "module.pt"
    torch.save({"model": m, "train_args": {}}, p)
    with pytest.raises(ValueError, match="allow_pickle"):
        pretrained.load_checkpoint_state(str(p))
    s = pretrained.load_checkpoint_state(str(p), allow_pickle=True)
    assert set(s) == {"weight", "bias"}


def test_cli_train_detector_pretrained_e2e(tmp_path, capsys):
    """Full CLI path: a torch YOLOv8 replica checkpoint saved to disk
    feeds ``train-detector --pretrained`` (the reference's
    yolov8m.pt-start, train_yolo_augmented.py:25) for a 2-step run, and
    the imported backbone weights survive into the saved checkpoint."""
    from robust_object_detection_tpu import cli
    from robust_object_detection_tpu.data import convert, synthetic
    from robust_object_detection_tpu.train import detector
    from tests._torch_yolo import DetectionModel, randomize

    det = synthetic.make_det_split(tmp_path / "raw", n_images=16,
                                   size_range=((48, 49), (48, 49)))
    convert.convert_det_to_coco(det, tmp_path / "coco", "val")
    convert.convert_det_to_coco(det, tmp_path / "coco", "train")

    tm = randomize(DetectionModel(nc=6, variant="n"))
    ckpt = tmp_path / "yolov8n.pt"
    torch.save({"model": tm}, ckpt)

    # module-bearing .pt files need the explicit --allow-pickle opt-in
    # (default-off: unpickling runs arbitrary code)
    with pytest.raises(ValueError, match="allow_pickle"):
        cli.main(["train-detector", "--model", "yolo", "--variant", "n",
                  "--data-root", str(tmp_path / "coco"),
                  "--out", str(tmp_path / "run_nopickle"),
                  "--img-size", "64", "--batch-size", "8", "--epochs", "1",
                  "--max-steps", "1", "--pretrained", str(ckpt)])

    out = tmp_path / "run"
    cli.main(["train-detector", "--model", "yolo", "--variant", "n",
              "--data-root", str(tmp_path / "coco"), "--out", str(out),
              "--img-size", "64", "--batch-size", "8", "--epochs", "1",
              "--max-steps", "1", "--pretrained", str(ckpt),
              "--allow-pickle"])
    printed = capsys.readouterr().out
    assert "pretrained import" in printed

    # the saved last-checkpoint still carries the imported stem kernel
    # (2 SGD steps cannot erase it): compare against the torch weights
    model, state = detector.load_checkpoint(out, img_size=64, variant="n")
    tk = tm.state_dict()["model.0.conv.weight"].numpy()  # (O, I, kh, kw)
    fk = np.asarray(state.params["Backbone_0"]["ConvBnAct_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(fk, tk.transpose(2, 3, 1, 0), atol=5e-2)


def test_cli_train_vid_pretrained_e2e(tmp_path, capsys):
    """VID leg with a pretrained start: flattened VID frames
    (--data-layout yolo) + --pretrained, mirroring the reference's
    train_vid_yolo_baseline.py:16 which begins from yolov8m.pt."""
    from robust_object_detection_tpu import cli
    from robust_object_detection_tpu.data import convert, synthetic
    from robust_object_detection_tpu.train import detector
    from tests._torch_yolo import DetectionModel, randomize

    vid = synthetic.make_vid_split(tmp_path / "vid", n_seqs=2,
                                   frames_per_seq=6, hw=(48, 48))
    convert.convert_vid_to_yolo(vid, tmp_path / "vid_yolo6", "train")

    tm = randomize(DetectionModel(nc=6, variant="n"))
    ckpt = tmp_path / "yolov8n.pt"
    torch.save({"model": tm}, ckpt)

    out = tmp_path / "run"
    cli.main(["train-detector", "--model", "yolo", "--variant", "n",
              "--data-root", str(tmp_path / "vid_yolo6"),
              "--data-layout", "yolo", "--out", str(out),
              "--img-size", "64", "--batch-size", "8", "--epochs", "1",
              "--max-steps", "1", "--pretrained", str(ckpt),
              "--allow-pickle"])
    printed = capsys.readouterr().out
    assert "pretrained import" in printed

    model, state = detector.load_checkpoint(out, img_size=64, variant="n")
    tk = tm.state_dict()["model.0.conv.weight"].numpy()
    fk = np.asarray(
        state.params["Backbone_0"]["ConvBnAct_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(fk, tk.transpose(2, 3, 1, 0), atol=5e-2)
