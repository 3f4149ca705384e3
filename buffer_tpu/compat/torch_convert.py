"""Reference ``.pth`` checkpoint -> flax variables conversion.

The reference stores the *full* composite state dict per trained stage and
composes a model by key-substring filtering (keep keys containing the stage
name) and dict-merge (``ThreeDMatch/test.py:207-214``,
``ThreeDMatch/train.py:37-47``).  :func:`load_reference_checkpoint`
reproduces exactly that, then :func:`convert_state_dict` maps the torch
tensors onto our flax trees:

* ``Linear.weight (out,in)``            -> ``Dense.kernel (in,out)``
* ``Conv1d/2d k=1``                      -> Dense kernel
* ``Conv2d (out,in,kh,kw)``              -> ``Conv.kernel (kh,kw,in,out)``
* ``Conv3d (out,in,kd,kh,kw)``           -> ``(kd,kh,kw,in,out)``
* BN ``running_mean/var``                -> ``batch_stats .../{mean,var}``

Loading uses ``torch.load`` on CPU only (torch never touches the compute
path).  Tensor name tables below mirror the module layout documented in
each model's docstring.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def load_reference_checkpoint(paths: Dict[str, str]) -> Dict[str, np.ndarray]:
    """Merge per-stage ``best.pth`` files with the reference's
    key-substring filter.  ``paths``: stage name -> file path."""
    import torch

    merged: Dict[str, np.ndarray] = {}
    for stage, path in paths.items():
        sd = torch.load(path, map_location="cpu")
        for k, v in sd.items():
            if stage in k:
                merged[k] = _np(v)
    return merged


# --------------------------------------------------------------------------
# key translation
# --------------------------------------------------------------------------

def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(params, stats, prefix, torch_key, w):
    _set(params, prefix + ("kernel",), w.T)


def _bn(params, stats, prefix, leaf, w):
    if leaf == "weight":
        _set(params, prefix + ("weight",), w)
    elif leaf == "bias":
        _set(params, prefix + ("bias",), w)
    elif leaf == "running_mean":
        _set(stats, prefix + ("mean",), w)
    elif leaf == "running_var":
        _set(stats, prefix + ("var",), w)
    # num_batches_tracked dropped


def _conv_nd(w: np.ndarray) -> np.ndarray:
    """torch conv weight -> flax Conv kernel."""
    if w.ndim == 4:    # Conv2d
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 5:    # Conv3d
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(w.shape)


def _vnllr(params, stats, out_prefix, rest, w):
    """VNLinearLeakyReLU subtree: map_to_feat / batchnorm.bn / map_to_dir."""
    if rest[0] in ("map_to_feat", "map_to_dir"):
        _set(params, out_prefix + (rest[0], "kernel"), w.T)
    elif rest[0] == "batchnorm":
        _bn(params, stats, out_prefix + ("batchnorm", "bn"), rest[-1], w)
    else:
        raise KeyError(rest)


# conv_net op-index -> (our name, kind); see buffer_tpu/nn/cylindrical.py
_CYL_OPS = {0: ("conv3d_0", "conv"), 1: ("bn3d_0", "bn")}
for _i in range(6):
    _CYL_OPS[3 + 3 * _i] = (f"conv2d_{_i}", "conv")
    _CYL_OPS[4 + 3 * _i] = (f"bn2d_{_i}", "bn")
_CYL_OPS[21] = ("conv2d_out", "conv")

_COST_OPS = {}
for _i in range(9):
    _COST_OPS[3 * _i] = (f"conv3d_{_i}", "conv")
    _COST_OPS[3 * _i + 1] = (f"bn3d_{_i}", "bn")
_COST_OPS[27] = ("conv3d_out", "conv")

# InvariantHead: torch sequential index -> our name
_HEAD_SEQ = {"1": "conv1", "3": "conv2", "5": "conv3"}


def convert_state_dict(sd: Dict[str, np.ndarray]):
    """Full merged reference state dict -> ({'Ref':…, 'Desc':…, 'Keypt':…,
    'Inlier':…} params, same-shape batch_stats)."""
    params: Dict[str, dict] = {s: {} for s in ("Ref", "Desc", "Keypt", "Inlier")}
    stats: Dict[str, dict] = {s: {} for s in ("Ref", "Desc", "Keypt", "Inlier")}

    for key, w in sd.items():
        parts = key.split(".")
        stage = parts[0]
        p, s = params[stage], stats[stage]
        rest = parts[1:]

        if rest == ["epsilon"]:
            continue  # declared but unused (point_learner.py:30)

        if stage in ("Ref", "Keypt"):
            head_name = "inv_layer" if stage == "Ref" else "invar_layer"
            if rest[0] in ("encoder_blocks", "decoder_blocks"):
                block = f"{rest[0]}_{rest[1]}"
                _vnllr(p, s, (block, rest[2]), rest[3:], w)
            elif rest[0] == "fc_layer":
                _vnllr(p, s, (f"fc_layer_{rest[1]}",), rest[2:], w)
            elif rest[0] == head_name:
                if rest[1] == "0":  # VNStdFeature
                    if rest[2] in ("vn1", "vn2"):
                        _vnllr(p, s, (head_name, "std", rest[2]), rest[3:], w)
                    else:  # vn_lin
                        _set(p, (head_name, "std", "vn_lin", "kernel"), w.T)
                else:  # Conv1d k=1 -> Dense
                    name = _HEAD_SEQ[rest[1]]
                    if rest[2] == "weight":
                        _set(p, (head_name, name, "kernel"), w[:, :, 0].T)
                    else:
                        _set(p, (head_name, name, "bias"), w)
            else:
                raise KeyError(key)

        elif stage == "Desc":
            if rest[0] == "pnt_layer":
                if rest[1] == "0":
                    if rest[2] == "weight":
                        _set(p, ("pnt_conv", "kernel"), w[:, :, 0, 0].T)
                    else:
                        _set(p, ("pnt_conv", "bias"), w)
                else:
                    _bn(p, s, ("pnt_bn",), rest[2], w)
            elif rest[0] == "pool_layer":
                table = {"0": ("pool_conv1", "dense"), "1": ("pool_bn1", "bn"),
                         "3": ("pool_conv2", "dense"), "4": ("pool_bn2", "bn")}
                name, kind = table[rest[1]]
                if kind == "dense":
                    if rest[2] == "weight":
                        _set(p, (name, "kernel"), w[:, :, 0, 0].T)
                    else:
                        _set(p, (name, "bias"), w)
                else:
                    _bn(p, s, (name,), rest[2], w)
            elif rest[0] == "conv_net":
                name, kind = _CYL_OPS[int(rest[2])]
                if kind == "conv":
                    if rest[3] == "weight":
                        _set(p, ("conv_net", name, "kernel"), _conv_nd(w))
                    else:
                        _set(p, ("conv_net", name, "bias"), w)
                else:
                    _bn(p, s, ("conv_net", name), rest[3], w)
            else:
                raise KeyError(key)

        elif stage == "Inlier":
            assert rest[0] == "conv" and rest[1] == "ops"
            name, kind = _COST_OPS[int(rest[2])]
            if kind == "conv":
                if rest[3] == "weight":
                    _set(p, ("conv", name, "kernel"), _conv_nd(w))
                else:
                    _set(p, ("conv", name, "bias"), w)
            else:
                _bn(p, s, ("conv", name), rest[3], w)
        else:
            raise KeyError(key)

    return params, stats


def load_variables(paths: Dict[str, str]):
    """Stage paths -> per-stage flax variables
    ``{stage: {'params': …, 'batch_stats': …}}`` as jnp arrays."""
    import jax.numpy as jnp
    from jax import tree_util

    sd = load_reference_checkpoint(paths)
    params, stats = convert_state_dict(sd)
    to_jnp = lambda tree: tree_util.tree_map(jnp.asarray, tree)
    return {
        stage: {"params": to_jnp(params[stage]),
                "batch_stats": to_jnp(stats[stage])}
        for stage in params
    }
