"""Checkpoint save/load for buffer_tpu variables.

Layout mirrors the reference's per-stage snapshot scheme
(``snapshot/<exp_id>/<stage>/best.pth`` with full-model state dicts merged
by key-substring filtering, ThreeDMatch/trainer.py:322-326,
train.py:37-47): we save the full variables dict per stage directory and
merge per-stage files by taking each file's own stage subtree.

Format: flax msgpack (``flax.serialization``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_variables(variables: Dict[str, dict], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_file(path: str, template: Optional[Dict[str, dict]] = None):
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def merge_stage_checkpoints(paths: Dict[str, str], template=None):
    """Per-stage snapshot files -> one variables dict; each stage's subtree
    comes from its own best file (the reference's filter-merge,
    ThreeDMatch/test.py:207-214)."""
    merged = {}
    for stage, path in paths.items():
        full = load_file(path, template)
        merged[stage] = full[stage]
    return merged
