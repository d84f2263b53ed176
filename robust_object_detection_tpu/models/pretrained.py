"""Pretrained-checkpoint import: named mappers for the reference's models.

Every reference detector starts from pretrained weights — torchvision's
COCO-pretrained Faster R-CNN (train_frcnn_baseline.py:139 ``weights=
"DEFAULT"``) and Ultralytics ``yolov8m.pt`` / ``rtdetr-l.pt``
(train_yolo_augmented.py:25, train_rtdetr_augmented.py:25) — and the eval
sweep loads the trained ``best.pt``/``best.pth`` artifacts
(eval_all.py:47-54). This module maps those torch state dicts onto our Flax
models by NAME (the serialisation layouts of torchvision/Ultralytics are a
stable public contract), unlike models/import_torch.py's order-based
structural matcher which cannot handle torch modules whose registration
order differs from call order (e.g. C2f registers cv1, cv2 then m.*, but
calls cv2 last).

Layout conversions are shared with import_torch (OIHW->HWIO etc.). Class-
count mismatches in final prediction layers (COCO-80 checkpoint onto an
nc=6 model) are skipped with a report line when ``strict_head=False`` — the
same "transferred N/M items" behaviour Ultralytics applies when fine-tuning.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from . import import_torch as it


class ImportReport:
    """Collects per-tensor outcomes; str() is a human-readable summary."""

    def __init__(self) -> None:
        self.imported: List[str] = []
        self.skipped: List[str] = []

    def __str__(self) -> str:
        lines = [f"imported {len(self.imported)} tensors, "
                 f"skipped {len(self.skipped)}"]
        lines += [f"  SKIP {s}" for s in self.skipped]
        return "\n".join(lines)


def load_checkpoint_state(path: str, allow_pickle: bool = False
                          ) -> Dict[str, np.ndarray]:
    """Load a torch ``.pt``/``.pth`` into {key: float32 ndarray}.

    Handles the three payload shapes the reference produces/consumes:
      * plain state dicts and {"model": state_dict} wrappers
        (train_frcnn_baseline.py:196 saves {"model": state_dict, ...}),
      * Ultralytics checkpoints whose "model"/"ema" entry is a pickled
        nn.Module — those require ``allow_pickle=True`` because
        ``weights_only=True`` cannot unpickle arbitrary classes. Only set
        it for checkpoints you trust; prefer pre-exported state dicts.
    """
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain-tensor checkpoint (Ultralytics "
                f".pt files pickle the whole nn.Module). Re-load with "
                f"allow_pickle=True if the file is trusted, or export "
                f"its state_dict first.")
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("ema", "model"):
        if isinstance(obj, dict) and obj.get(key) is not None:
            obj = obj[key]
            break
    if hasattr(obj, "state_dict"):          # an nn.Module payload
        obj = obj.float().state_dict()
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().float().numpy()
    return out


def strip_prefix(state: Dict[str, np.ndarray], prefix: str
                 ) -> Dict[str, np.ndarray]:
    """Remove one leading prefix ("model.") from every key that has it."""
    n = len(prefix)
    return {(k[n:] if k.startswith(prefix) else k): v
            for k, v in state.items()}


# ── tree plumbing ────────────────────────────────────────────────────────

def _get(tree: dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            raise KeyError("/".join(path))
        node = node[p]
    return node


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree


class _Mapper:
    """Applies torch tensors onto a {"params","batch_stats"} tree copy."""

    def __init__(self, variables: dict, state: Dict[str, np.ndarray]):
        self.params = _copy_tree(variables["params"])
        self.stats = _copy_tree(variables.get("batch_stats", {}))
        self.state = dict(state)
        self.report = ImportReport()

    def take(self, key: str) -> np.ndarray:
        return self.state.pop(key)

    def conv(self, tkey: str, fpath: Tuple[str, ...],
             bias: bool = False, dense: bool = False,
             strict: bool = True) -> bool:
        """torch ``{tkey}.weight``(+``.bias``) -> flax kernel(+bias)."""
        w = self.take(f"{tkey}.weight")
        conv = (it.dense_kernel(w) if dense else it.conv_kernel(w))
        target = _get(self.params, fpath + ("kernel",))
        if conv.shape != target.shape:
            if strict:
                raise ValueError(f"{tkey}: {conv.shape} does not fit "
                                 f"{'/'.join(fpath)} {target.shape}")
            self.report.skipped.append(
                f"{tkey} {conv.shape} vs {target.shape}")
            if bias:
                self.take(f"{tkey}.bias")
            return False
        _set(self.params, fpath + ("kernel",), conv.astype(target.dtype))
        if bias:
            b = self.take(f"{tkey}.bias")
            tb = _get(self.params, fpath + ("bias",))
            _set(self.params, fpath + ("bias",), b.astype(tb.dtype))
        self.report.imported.append(tkey)
        return True

    def bn(self, tkey: str, fpath: Tuple[str, ...],
           skip: bool = False) -> None:
        """torch BN ``{tkey}.{weight,bias,running_mean,running_var}`` ->
        flax BatchNorm params + batch_stats."""
        if skip:
            for tleaf in ("weight", "bias", "running_mean", "running_var"):
                self.take(f"{tkey}.{tleaf}")
            self.state.pop(f"{tkey}.num_batches_tracked", None)
            return
        for tleaf, fleaf, tree in (("weight", "scale", self.params),
                                   ("bias", "bias", self.params),
                                   ("running_mean", "mean", self.stats),
                                   ("running_var", "var", self.stats)):
            v = self.take(f"{tkey}.{tleaf}")
            target = _get(tree, fpath + (fleaf,))
            if v.shape != target.shape:
                raise ValueError(f"{tkey}.{tleaf}: {v.shape} vs "
                                 f"{target.shape} at {'/'.join(fpath)}")
            _set(tree, fpath + (fleaf,), v.astype(target.dtype))
        self.state.pop(f"{tkey}.num_batches_tracked", None)
        self.report.imported.append(tkey)

    def conv_bn(self, tkey: str, fpath: Tuple[str, ...],
                strict: bool = True) -> None:
        """An Ultralytics ``Conv`` block: {tkey}.conv + {tkey}.bn ->
        ConvBnAct (Conv_0 kernel + BatchNorm_0). With strict=False a
        shape-mismatched block is skipped whole (conv AND its BN)."""
        ok = self.conv(f"{tkey}.conv", fpath + ("Conv_0",), strict=strict)
        self.bn(f"{tkey}.bn", fpath + ("BatchNorm_0",), skip=not ok)

    def ln(self, tkey: str, fpath: Tuple[str, ...]) -> None:
        """torch LayerNorm -> flax LayerNorm (scale/bias)."""
        for tleaf, fleaf in (("weight", "scale"), ("bias", "bias")):
            v = self.take(f"{tkey}.{tleaf}")
            target = _get(self.params, fpath + (fleaf,))
            if v.shape != target.shape:
                raise ValueError(f"{tkey}.{tleaf}: {v.shape} vs "
                                 f"{target.shape}")
            _set(self.params, fpath + (fleaf,), v.astype(target.dtype))
        self.report.imported.append(tkey)

    def finish(self, variables: dict, ignore=()) -> dict:
        leftovers = [k for k in self.state
                     if not any(k.startswith(p) for p in ignore)
                     and not k.endswith("num_batches_tracked")]
        if leftovers:
            raise ValueError(f"{len(leftovers)} torch tensors unmapped, "
                             f"first: {leftovers[:5]}")
        out = dict(variables, params=self.params)
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# ── YOLOv8 (Ultralytics DetectionModel layout) ───────────────────────────

def _c2f(m: _Mapper, t: str, f: Tuple[str, ...], n: int) -> None:
    """C2f: torch cv1/cv2/m.j.cv{1,2} -> flax ConvBnAct_0/ConvBnAct_1/
    Bottleneck_j/ConvBnAct_{0,1} (registration order differs from call
    order, hence the explicit table)."""
    m.conv_bn(f"{t}.cv1", f + ("ConvBnAct_0",))
    m.conv_bn(f"{t}.cv2", f + ("ConvBnAct_1",))
    for j in range(n):
        m.conv_bn(f"{t}.m.{j}.cv1", f + (f"Bottleneck_{j}", "ConvBnAct_0"))
        m.conv_bn(f"{t}.m.{j}.cv2", f + (f"Bottleneck_{j}", "ConvBnAct_1"))


def import_yolov8(state: Dict[str, np.ndarray], variables: dict,
                  variant: str = "m", strict_head: bool = True
                  ) -> Tuple[dict, ImportReport]:
    """Map an Ultralytics YOLOv8 detection state dict onto models/yolov8.py.

    state: keys like ``model.0.conv.weight`` (DetectionModel.state_dict();
    the ``model.`` prefix is stripped here). The layer-index topology is
    the yolov8 yaml: 0-9 backbone, 12/15/16/18/19/21 neck, 22 Detect.
    strict_head=False skips class-count-mismatched final cls convs (COCO-80
    checkpoint onto an nc=6 model) keeping their fresh init.
    """
    from .yolov8 import YoloConfig

    cfg = YoloConfig(6, variant)
    state = strip_prefix(state, "model.")
    m = _Mapper(variables, state)
    B = ("Backbone_0",)
    N = ("Neck_0",)
    H = ("Head_0",)
    m.conv_bn("0", B + ("ConvBnAct_0",))
    m.conv_bn("1", B + ("ConvBnAct_1",))
    _c2f(m, "2", B + ("C2f_0",), cfg.depth(3))
    m.conv_bn("3", B + ("ConvBnAct_2",))
    _c2f(m, "4", B + ("C2f_1",), cfg.depth(6))
    m.conv_bn("5", B + ("ConvBnAct_3",))
    _c2f(m, "6", B + ("C2f_2",), cfg.depth(6))
    m.conv_bn("7", B + ("ConvBnAct_4",))
    _c2f(m, "8", B + ("C2f_3",), cfg.depth(3))
    m.conv_bn("9.cv1", B + ("SPPF_0", "ConvBnAct_0"))
    m.conv_bn("9.cv2", B + ("SPPF_0", "ConvBnAct_1"))
    _c2f(m, "12", N + ("C2f_0",), cfg.depth(3))
    _c2f(m, "15", N + ("C2f_1",), cfg.depth(3))
    m.conv_bn("16", N + ("ConvBnAct_0",))
    _c2f(m, "18", N + ("C2f_2",), cfg.depth(3))
    m.conv_bn("19", N + ("ConvBnAct_1",))
    _c2f(m, "21", N + ("C2f_3",), cfg.depth(3))
    for i in range(3):
        m.conv_bn(f"22.cv2.{i}.0", H + (f"box{i}_0",))
        m.conv_bn(f"22.cv2.{i}.1", H + (f"box{i}_1",))
        m.conv(f"22.cv2.{i}.2", H + (f"box{i}_out",), bias=True)
        # class branch width is max(ch0, min(nc,100)) — a different-nc
        # checkpoint can mismatch the whole branch, not just the out conv
        m.conv_bn(f"22.cv3.{i}.0", H + (f"cls{i}_0",), strict=strict_head)
        m.conv_bn(f"22.cv3.{i}.1", H + (f"cls{i}_1",), strict=strict_head)
        m.conv(f"22.cv3.{i}.2", H + (f"cls{i}_out",), bias=True,
               strict=strict_head)
    # 22.dfl.conv.weight is the fixed arange(16) integral kernel — our
    # decode computes the DFL expectation directly (yolov8.dfl_expectation)
    m.state.pop("22.dfl.conv.weight", None)
    return m.finish(variables), m.report


# ── Faster R-CNN (torchvision fasterrcnn_resnet50_fpn_v2 layout) ─────────

RESNET50_STAGES = (3, 4, 6, 3)


def import_frcnn(state: Dict[str, np.ndarray], variables: dict,
                 strict_head: bool = True) -> Tuple[dict, ImportReport]:
    """Map a torchvision ``fasterrcnn_resnet50_fpn_v2`` state dict onto
    models/frcnn.FasterRCNN (the checkpoint the reference fine-tunes from,
    train_frcnn_baseline.py:139 ``weights="DEFAULT"``, and the ``best.pth``
    artifacts eval_all.py:79-87 reloads).

    strict_head=False skips the class-count-dependent box_predictor layers
    (COCO-91 checkpoint onto the 7-class model) keeping their fresh init.
    Requires the model built with the v2 FPN (fpn.FPN(norm=True)).
    """
    m = _Mapper(variables, state)
    # ResNet-50 body: conv1/bn1 stem + 16 bottlenecks across layer1..4
    m.conv("backbone.body.conv1", ("backbone", "Conv_0"))
    m.bn("backbone.body.bn1", ("backbone", "BatchNorm_0"))
    blk = 0
    for s, n_blocks in enumerate(RESNET50_STAGES):
        for j in range(n_blocks):
            t = f"backbone.body.layer{s + 1}.{j}"
            f = ("backbone", f"BottleneckBlock_{blk}")
            for c in range(3):
                m.conv(f"{t}.conv{c + 1}", f + (f"Conv_{c}",))
                m.bn(f"{t}.bn{c + 1}", f + (f"BatchNorm_{c}",))
            if f"{t}.downsample.0.weight" in m.state:
                m.conv(f"{t}.downsample.0", f + ("Conv_3",))
                m.bn(f"{t}.downsample.1", f + ("BatchNorm_3",))
            blk += 1
    # FPN v2: inner/layer blocks are Conv2dNormActivation(conv+BN)
    for i in range(4):
        m.conv(f"backbone.fpn.inner_blocks.{i}.0",
               ("fpn", f"lateral{i}"))
        m.bn(f"backbone.fpn.inner_blocks.{i}.1",
             ("fpn", f"lateral{i}_bn"))
        m.conv(f"backbone.fpn.layer_blocks.{i}.0", ("fpn", f"post{i}"))
        m.bn(f"backbone.fpn.layer_blocks.{i}.1", ("fpn", f"post{i}_bn"))
    # RPN v2 head: two 3x3 convs (bias, no norm) + 1x1 obj/box outs
    m.conv("rpn.head.conv.0.0", ("rpn_head", "conv0"), bias=True)
    m.conv("rpn.head.conv.1.0", ("rpn_head", "conv1"), bias=True)
    m.conv("rpn.head.cls_logits", ("rpn_head", "obj"), bias=True)
    m.conv("rpn.head.bbox_pred", ("rpn_head", "box"), bias=True)
    # v2 box head: 4x (conv bias-free + BN) + flatten + FC 1024
    for i in range(4):
        m.conv(f"roi_heads.box_head.{i}.0", ("box_head", f"Conv_{i}"))
        m.bn(f"roi_heads.box_head.{i}.1", ("box_head", f"BatchNorm_{i}"))
    _dense_chw(m, "roi_heads.box_head.5", ("box_head", "Dense_0"),
               chw=(256, 7, 7))
    m.conv("roi_heads.box_predictor.cls_score",
           ("box_head", "Dense_1"), bias=True, dense=True,
           strict=strict_head)
    m.conv("roi_heads.box_predictor.bbox_pred",
           ("box_head", "Dense_2"), bias=True, dense=True,
           strict=strict_head)
    return m.finish(variables), m.report


# ── RT-DETR-L (Ultralytics rtdetr-l layout) ──────────────────────────────

def _mha(m: _Mapper, tkey: str, fpath: Tuple[str, ...], heads: int) -> None:
    """torch nn.MultiheadAttention (packed in_proj) -> flax
    MultiHeadDotProductAttention (separate q/k/v/out Dense with
    (c, heads, dh) kernels; head-major layouts line up on both sides)."""
    w = m.take(f"{tkey}.in_proj_weight")           # (3c, c)
    bias = m.take(f"{tkey}.in_proj_bias")          # (3c,)
    c = w.shape[1]
    dh = c // heads
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * c:(i + 1) * c].T.reshape(c, heads, dh)
        bi = bias[i * c:(i + 1) * c].reshape(heads, dh)
        tk = _get(m.params, fpath + (name, "kernel"))
        if wi.shape != tk.shape:
            raise ValueError(f"{tkey}.{name}: {wi.shape} vs {tk.shape}")
        _set(m.params, fpath + (name, "kernel"), wi.astype(tk.dtype))
        _set(m.params, fpath + (name, "bias"), bi.astype(tk.dtype))
    wo = m.take(f"{tkey}.out_proj.weight")         # (c, c)
    bo = m.take(f"{tkey}.out_proj.bias")
    ko = wo.T.reshape(heads, dh, c)
    to = _get(m.params, fpath + ("out", "kernel"))
    if ko.shape != to.shape:
        raise ValueError(f"{tkey}.out: {ko.shape} vs {to.shape}")
    _set(m.params, fpath + ("out", "kernel"), ko.astype(to.dtype))
    _set(m.params, fpath + ("out", "bias"), bo.astype(to.dtype))
    m.report.imported.append(tkey)


def _conv2x2(m: _Mapper, tkey: str, fpath: Tuple[str, ...]) -> None:
    """HGStem stem2a/stem2b: torch 2x2 OIHW conv -> Conv2x2Pad's (2,2,I,O)
    kernel + its BN."""
    w = m.take(f"{tkey}.conv.weight")
    conv = it.conv_kernel(w)
    target = _get(m.params, fpath + ("kernel",))
    if conv.shape != target.shape:
        raise ValueError(f"{tkey}: {conv.shape} vs {target.shape}")
    _set(m.params, fpath + ("kernel",), conv.astype(target.dtype))
    m.bn(f"{tkey}.bn", fpath + ("BatchNorm_0",))
    m.report.imported.append(tkey)


def _hgblock(m: _Mapper, t: str, f: Tuple[str, ...], light: bool,
             n: int = 6) -> None:
    for j in range(n):
        if light:
            m.conv_bn(f"{t}.m.{j}.conv1",
                      f + (f"LightConv_{j}", "ConvBnAct_0"))
            m.conv_bn(f"{t}.m.{j}.conv2",
                      f + (f"LightConv_{j}", "ConvBnAct_1"))
        else:
            m.conv_bn(f"{t}.m.{j}", f + (f"ConvBnAct_{j}",))
    off = 0 if light else n
    m.conv_bn(f"{t}.sc", f + (f"ConvBnAct_{off}",))
    m.conv_bn(f"{t}.ec", f + (f"ConvBnAct_{off + 1}",))


def _repc3(m: _Mapper, t: str, f: Tuple[str, ...], n: int = 3) -> None:
    m.conv_bn(f"{t}.cv1", f + ("cv1",))
    m.conv_bn(f"{t}.cv2", f + ("cv2",))
    for j in range(n):
        m.conv_bn(f"{t}.m.{j}.conv1", f + (f"m{j}", "conv1"))
        m.conv_bn(f"{t}.m.{j}.conv2", f + (f"m{j}", "conv2"))


def _mlp(m: _Mapper, t: str, f: Tuple[str, ...], n: int = 3,
         strict: bool = True) -> None:
    for j in range(n):
        m.conv(f"{t}.layers.{j}", f + (f"Dense_{j}",), bias=True,
               dense=True, strict=strict)


def import_rtdetr(state: Dict[str, np.ndarray], variables: dict,
                  strict_head: bool = True) -> Tuple[dict, ImportReport]:
    """Map an Ultralytics RT-DETR-L state dict (``rtdetr-l.pt`` /
    fine-tuned ``best.pt``, train_rtdetr_augmented.py:25) onto
    models/rtdetr.RTDETR.

    Covers the full yaml graph: model.0-9 HGNetv2 (incl. the 2x2 stem
    convs via Conv2x2Pad), 10-27 hybrid encoder (AIFI packed attention,
    RepC3/RepConv), 28 RTDETRDecoder (input_proj, 6 deformable layers,
    per-layer heads, denoising embedding). strict_head=False skips
    class-count-dependent heads (enc/dec score heads, dn embedding) for
    COCO-80 -> nc=6 fine-tuning starts.
    """
    cfg_heads = 8
    state = strip_prefix(state, "model.")
    m = _Mapper(variables, state)
    B = ("HGNetV2L_0",)
    # backbone
    st = B + ("HGStem_0",)
    m.conv_bn("0.stem1", st + ("stem1",))
    _conv2x2(m, "0.stem2a", st + ("stem2a",))
    _conv2x2(m, "0.stem2b", st + ("stem2b",))
    m.conv_bn("0.stem3", st + ("stem3",))
    m.conv_bn("0.stem4", st + ("stem4",))
    _hgblock(m, "1", B + ("HGBlock_0",), light=False)
    m.conv_bn("2", B + ("ConvBnAct_0",))
    _hgblock(m, "3", B + ("HGBlock_1",), light=False)
    m.conv_bn("4", B + ("ConvBnAct_1",))
    _hgblock(m, "5", B + ("HGBlock_2",), light=True)
    _hgblock(m, "6", B + ("HGBlock_3",), light=True)
    _hgblock(m, "7", B + ("HGBlock_4",), light=True)
    m.conv_bn("8", B + ("ConvBnAct_2",))
    _hgblock(m, "9", B + ("HGBlock_5",), light=True)
    # hybrid encoder
    E = ("encoder",)
    m.conv_bn("10", E + ("proj2",))
    A = E + ("aifi",)
    _mha(m, "11.ma", A + ("ma",), cfg_heads)
    m.conv("11.fc1", A + ("fc1",), bias=True, dense=True)
    m.conv("11.fc2", A + ("fc2",), bias=True, dense=True)
    m.ln("11.norm1", A + ("norm1",))
    m.ln("11.norm2", A + ("norm2",))
    m.conv_bn("12", E + ("lateral0",))
    m.conv_bn("14", E + ("proj1",))
    _repc3(m, "16", E + ("fpn0",))
    m.conv_bn("17", E + ("lateral1",))
    m.conv_bn("19", E + ("proj0",))
    _repc3(m, "21", E + ("fpn1",))
    m.conv_bn("22", E + ("down0",))
    _repc3(m, "24", E + ("pan0",))
    m.conv_bn("25", E + ("down1",))
    _repc3(m, "27", E + ("pan1",))
    # decoder (model.28)
    D = "28"
    for i in range(3):
        m.conv(f"{D}.input_proj.{i}.0", (f"dec_proj{i}", "Conv_0"))
        m.bn(f"{D}.input_proj.{i}.1", (f"dec_proj{i}", "BatchNorm_0"))
    m.conv(f"{D}.enc_output.0", ("enc_output",), bias=True, dense=True)
    m.ln(f"{D}.enc_output.1", ("enc_norm",))
    m.conv(f"{D}.enc_score_head", ("enc_score",), bias=True, dense=True,
           strict=strict_head)
    _mlp(m, f"{D}.enc_bbox_head", ("enc_bbox",))
    _embed_rows(m, f"{D}.denoising_class_embed", ("dn_class_embed",))
    _mlp(m, f"{D}.query_pos_head", ("query_pos",), n=2)
    n_layers = len({k.split(".")[3] for k in m.state
                    if k.startswith(f"{D}.decoder.layers.")})
    for li in range(n_layers):
        t = f"{D}.decoder.layers.{li}"
        f = (f"layer{li}",)
        _mha(m, f"{t}.self_attn", f + ("self_attn",), cfg_heads)
        for sub in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            m.conv(f"{t}.cross_attn.{sub}", f + ("cross_attn", sub),
                   bias=True, dense=True)
        for sub in ("norm1", "norm2", "norm3"):
            m.ln(f"{t}.{sub}", f + (sub,))
        m.conv(f"{t}.linear1", f + ("linear1",), bias=True, dense=True)
        m.conv(f"{t}.linear2", f + ("linear2",), bias=True, dense=True)
        m.conv(f"{D}.dec_score_head.{li}", (f"dec_score{li}",), bias=True,
               dense=True, strict=strict_head)
        _mlp(m, f"{D}.dec_bbox_head.{li}", (f"dec_bbox{li}",))
    return m.finish(variables), m.report


def _embed_rows(m: _Mapper, tkey: str, fpath: Tuple[str, ...]) -> None:
    """torch nn.Embedding -> flax nn.Embed; our table carries one extra
    background row (nc+1) which keeps its fresh init when the torch table
    is one row shorter."""
    w = m.take(f"{tkey}.weight")
    target = _get(m.params, fpath + ("embedding",))
    if w.shape[1] != target.shape[1] or w.shape[0] > target.shape[0]:
        m.report.skipped.append(f"{tkey} {w.shape} vs {target.shape}")
        return
    new = np.array(target)
    new[:w.shape[0]] = w
    _set(m.params, fpath + ("embedding",), new.astype(target.dtype))
    m.report.imported.append(tkey)


def _dense_chw(m: _Mapper, tkey: str, fpath: Tuple[str, ...],
               chw: Tuple[int, int, int]) -> None:
    """torch Linear over a flattened NCHW tensor -> flax Dense over the
    flattened NHWC tensor: permute the input axis C,H,W -> H,W,C."""
    w = m.take(f"{tkey}.weight")                    # (out, C*H*W)
    c, h, ww = chw
    w = w.reshape(w.shape[0], c, h, ww).transpose(0, 2, 3, 1)
    w = w.reshape(w.shape[0], -1).T                 # (H*W*C, out)
    target = _get(m.params, fpath + ("kernel",))
    if w.shape != target.shape:
        raise ValueError(f"{tkey}: {w.shape} vs {target.shape}")
    _set(m.params, fpath + ("kernel",), w.astype(target.dtype))
    b = m.take(f"{tkey}.bias")
    tb = _get(m.params, fpath + ("bias",))
    _set(m.params, fpath + ("bias",), b.astype(tb.dtype))
    m.report.imported.append(tkey)
