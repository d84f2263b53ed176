"""Torch checkpoint import: map PyTorch state dicts onto Flax param trees.

The reference's trained artifacts are torch: FRCNN/U-Net ``.pth`` state
dicts (train_frcnn_baseline.py:196, train_restoration.py:289) and
Ultralytics ``best.pt`` files (eval_all.py:47-54). This module imports them
into our models so a user can bring reference checkpoints across.

Strategy: STRUCTURAL matching, not name tables. Both frameworks serialise
modules in construction order, so flattening the torch state dict in
insertion order and the flax tree in module-definition order lines the
tensors up; each pair is checked by shape (after layout transposition) and
the import aborts loudly on any mismatch. This avoids hard-coding hundreds
of name pairs and survives cosmetic renames on either side.

Layout conversions:
  * conv kernels:            OIHW  -> HWIO
  * depthwise conv kernels:  O1HW  -> HW1O  (flax groups convention)
  * transposed conv kernels: IOHW  -> HWIO (+ flip? flax ConvTranspose uses
    the same cross-correlation convention as torch when kernels are stored
    HWIO with (in, out) -> no spatial flip needed)
  * linear weights:          (out, in) -> (in, out)
  * batchnorm:               weight/bias/running_mean/running_var ->
                             scale/bias/mean/var
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy, unwrapping common containers."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "state_dict", "ema"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


# ── Flattening ───────────────────────────────────────────────────────────

def _flatten_flax(tree: Any, prefix: Tuple[str, ...] = ()) -> List[
        Tuple[Tuple[str, ...], np.ndarray]]:
    out = []
    if isinstance(tree, dict):
        for k in tree:          # insertion order = module definition order
            out.extend(_flatten_flax(tree[k], prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def group_torch_layers(state: Dict[str, np.ndarray]
                       ) -> List[Tuple[str, Dict[str, np.ndarray]]]:
    """Group torch tensors by their parent module path, insertion-ordered,
    dropping buffers that have no flax counterpart (num_batches_tracked)."""
    layers: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        mod, leaf = k.rsplit(".", 1) if "." in k else ("", k)
        layers.setdefault(mod, {})[leaf] = v
    return list(layers.items())


# ── Conversions ──────────────────────────────────────────────────────────

def conv_kernel(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    """OIHW -> HWIO (depthwise O1HW -> HW1O)."""
    if depthwise:
        return w.transpose(2, 3, 1, 0)
    return w.transpose(2, 3, 1, 0)


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch IOHW -> flax HWIO with spatial flip + transpose semantics.

    flax ConvTranspose computes a fractionally-strided convolution with an
    HWIO kernel; torch's ConvTranspose2d(I, O) weight equals that kernel
    ROTATED 180 degrees in space with in/out swapped.
    """
    return np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1)


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return w.transpose(1, 0)


def module_call_order(model, *init_args, **init_kwargs
                      ) -> List[Tuple[str, ...]]:
    """Leaf-module paths of a flax model in CALL order.

    flax stores params sorted alphabetically (BatchNorm_0 before Conv_0,
    Conv_10 before Conv_2), which breaks order-based matching against a
    torch state dict; the actual forward-call order is recovered by
    intercepting leaf-module __call__ during a throwaway init.
    """
    import jax
    from flax import linen as nn

    leaf_types = ("Conv", "ConvTranspose", "Dense", "BatchNorm",
                  "LayerNorm", "GroupNorm", "Embed")
    order: List[Tuple[str, ...]] = []
    seen = set()

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        if type(m).__name__ in leaf_types:
            p = tuple(m.path)
            if p not in seen:
                seen.add(p)
                order.append(p)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(lambda: model.init(*init_args, **init_kwargs))
    return order


def assign(flax_params: Dict, torch_state: Dict[str, np.ndarray],
           call_order: List[Tuple[str, ...]] | None = None,
           strict: bool = True) -> Tuple[Dict, List[str]]:
    """Structurally assign a torch state dict onto a flax params+stats tree.

    flax_params: {"params": ..., "batch_stats": ...} (batch_stats optional).
    call_order: module paths in forward-call order (module_call_order);
    without it the flax tree's (alphabetical) order is used, which only
    matches torch registration order for trees without _10-style suffixes
    or interleaved module types.
    Returns (new tree, report lines). Shapes must agree after conversion.
    """
    flat = _flatten_flax(flax_params)
    # group flax leaves by owning module (all path components but the leaf)
    fmods: Dict[Tuple[str, ...], Dict[str, Tuple[Tuple[str, ...],
                                                 np.ndarray]]] = {}
    order: List[Tuple[str, ...]] = []
    for path, leaf in flat:
        # strip the variable collection ("params"/"batch_stats") so a
        # module's kernel and its BN stats group together
        mod = tuple(p for p in path[:-1] if p not in ("params",
                                                      "batch_stats"))
        if mod not in fmods:
            fmods[mod] = {}
            order.append(mod)
        fmods[mod][path[-1]] = (path, leaf)
    if call_order is not None:
        missing = [m for m in call_order if m not in fmods]
        if missing:
            raise ValueError(f"call_order paths absent from params: "
                             f"{missing[:3]}")
        order = list(call_order)

    new_leaves: Dict[Tuple[str, ...], np.ndarray] = {}
    report: List[str] = []
    tlayers = group_torch_layers(torch_state)
    ti = 0
    for mod in order:
        leaves = fmods[mod]
        if ti >= len(tlayers):
            msg = f"ran out of torch layers at flax module {'/'.join(mod)}"
            if strict:
                raise ValueError(msg)
            report.append(msg)
            break
        tname, tw = tlayers[ti]
        ti += 1
        if "kernel" in leaves and "weight" in tw:
            path, leaf = leaves["kernel"]
            w = tw["weight"]
            if w.ndim == 4:
                if leaf.ndim != 4:
                    raise ValueError(f"{tname}: conv vs non-conv at "
                                     f"{'/'.join(path)}")
                # The flax module NAME decides the conversion: when
                # in==out, a transposed conv's wrong (un-flipped) kernel
                # has the same shape as a regular conv's, so shape checks
                # alone cannot distinguish them.
                is_transpose = any(p.startswith("ConvTranspose")
                                   for p in mod)
                # OIHW->HWIO covers depthwise too (O1HW->HW1O is the same
                # transpose); transposed convs get the flipped variant.
                conv = (conv_transpose_kernel(w) if is_transpose
                        else conv_kernel(w))
                if conv.shape != leaf.shape:
                    raise ValueError(
                        f"{tname} weight {w.shape} does not fit flax "
                        f"{'/'.join(path)} {leaf.shape}")
                new_leaves[path] = conv.astype(leaf.dtype)
            elif w.ndim == 2:
                k = dense_kernel(w)
                if k.shape != leaf.shape:
                    raise ValueError(f"{tname}: dense shape mismatch "
                                     f"{k.shape} vs {leaf.shape}")
                new_leaves[path] = k.astype(leaf.dtype)
            else:
                raise ValueError(f"{tname}: unsupported weight ndim")
            if "bias" in leaves and "bias" in tw:
                pb, lb = leaves["bias"]
                new_leaves[pb] = tw["bias"].astype(lb.dtype)
            elif strict and ("bias" in leaves) != ("bias" in tw):
                raise ValueError(f"{tname}: bias presence mismatch at "
                                 f"{'/'.join(mod)}")
        if "scale" in leaves:          # BatchNorm / LayerNorm
            ps, ls = leaves["scale"]
            new_leaves[ps] = tw["weight"].astype(ls.dtype)
            pb, lb = leaves["bias"]
            new_leaves[pb] = tw["bias"].astype(lb.dtype)
            if "mean" in leaves:
                pm, lm = leaves["mean"]
                new_leaves[pm] = tw["running_mean"].astype(lm.dtype)
                pv, lv = leaves["var"]
                new_leaves[pv] = tw["running_var"].astype(lv.dtype)
        report.append(f"{tname} -> {'/'.join(mod)}")

    if strict and ti != len(tlayers):
        raise ValueError(f"{len(tlayers) - ti} torch layers unconsumed "
                         f"(first: {tlayers[ti][0]})")

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new_leaves.get(prefix, tree)

    return rebuild(flax_params), report
