"""Registration metrics and Redwood-format trajectory I/O.

Host-side ports of the reference's evaluation math
(``ThreeDMatch/test.py:18-196``): the 3DMatch/Redwood registration-recall
protocol (covariance-weighted transform error against ``gt.info``), DGR
RTE/RRE recall, and ``.log``/``.info`` parsing/writing
(http://redwood-data.org/indoor/fileformat.html).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np


def rte_rre(pose: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """DGR errors (ThreeDMatch/test.py:266-270): RTE = |t - t_gt|,
    RRE = arccos((tr(R^T R_gt) - 1)/2) in degrees."""
    rte = float(np.linalg.norm(pose[:3, 3] - gt[:3, 3]))
    cos = (np.trace(pose[:3, :3].T @ gt[:3, :3]) - 1.0) / 2.0
    rre = float(np.degrees(np.arccos(np.clip(cos, -1 + 1e-16, 1 - 1e-16))))
    return rte, rre


def dgr_recall(states: np.ndarray) -> Dict[str, float]:
    """states: [N, 3] of (success, rte, rre) rows
    (ThreeDMatch/test.py:279-285)."""
    ok = states[:, 0] == 1
    return {
        "recall": float(ok.mean()) if len(states) else 0.0,
        "TE": float(states[ok, 1].mean()) if ok.any() else float("nan"),
        "RE": float(states[ok, 2].mean()) if ok.any() else float("nan"),
    }


def mat2quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w,x,y,z), nibabel convention
    (used by computeTransformationErr, ThreeDMatch/test.py:107)."""
    from buffer_tpu.core import se3
    import jax.numpy as jnp
    return np.asarray(se3.rotation_matrix_to_quaternion(jnp.asarray(R)))


def compute_transformation_err(trans: np.ndarray, info: np.ndarray) -> float:
    """Covariance-weighted RMSE proxy (ThreeDMatch/test.py:92-111)."""
    t = trans[:3, 3]
    q = mat2quat(trans[:3, :3])
    er = np.concatenate([t, q[1:]], axis=0)
    p = er.reshape(1, 6) @ info @ er.reshape(6, 1) / info[0, 0]
    return float(p.item())


def evaluate_registration(num_fragment: int, result: np.ndarray,
                          result_pairs: np.ndarray, gt_pairs: np.ndarray,
                          gt: np.ndarray, gt_info: np.ndarray,
                          err2: float = 0.2):
    """Redwood registration recall over one scene
    (ThreeDMatch/test.py:114-173).  Only non-consecutive gt pairs count."""
    err2 = err2 ** 2
    gt_mask = np.zeros((num_fragment, num_fragment), dtype=np.int64)
    for idx in range(gt_pairs.shape[0]):
        i, j = int(gt_pairs[idx, 0]), int(gt_pairs[idx, 1])
        if j - i > 1:
            gt_mask[i, j] = idx
    n_gt = np.sum(gt_mask > 0)

    good = 0
    n_res = 0
    for idx in range(result_pairs.shape[0]):
        i, j = int(result_pairs[idx, 0]), int(result_pairs[idx, 1])
        if gt_mask[i, j] > 0:
            n_res += 1
            gt_idx = gt_mask[i, j]
            p = compute_transformation_err(
                np.linalg.inv(gt[gt_idx]) @ result[idx], gt_info[gt_idx])
            if p <= err2:
                good += 1
    if n_res == 0:
        n_res = int(1e6)
    precision = good / n_res
    recall = good / max(n_gt, 1)
    return precision, recall


# ---------------------------------------------------------------------------
# Redwood .log / .info files
# ---------------------------------------------------------------------------

def load_log(path: str) -> Dict[str, np.ndarray]:
    """gt.log -> {'i_j': 4x4}, keyed like the reference's loadlog
    (utils/tools.py:45-60)."""
    with open(path) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    out = {}
    i = 0
    while i < len(lines):
        head = lines[i].split()
        key = f"{int(head[0])}_{int(head[1])}"
        mat = np.array([[float(v) for v in lines[i + r + 1].split()]
                        for r in range(4)])
        out[key] = mat
        i += 5
    return out


def read_trajectory(path: str, dim: int = 4):
    """(pairs [N,3] str, traj [N,4,4]) (ThreeDMatch/test.py:18-55)."""
    with open(path) as f:
        lines = f.readlines()
    keys = lines[0::dim + 1]
    final_keys = [k.replace("\t", " ").split()[:3] for k in keys]
    traj = []
    for i, line in enumerate(lines):
        if i % (dim + 1) != 0:
            traj.append(line.replace("\t", " ").split()[:dim])
    traj = np.asarray(traj, dtype=np.float32).reshape(-1, dim, dim)
    return np.asarray(final_keys), traj


def read_trajectory_info(path: str, dim: int = 6):
    """(n_fragments, cov [N,6,6]) (ThreeDMatch/test.py:58-89)."""
    with open(path) as fid:
        contents = fid.readlines()
    n_pairs = len(contents) // 7
    info_list = []
    n_frame = 0
    for i in range(n_pairs):
        head = contents[i * 7].strip().split()
        n_frame = int(head[2])
        mat = np.concatenate([
            np.fromstring(contents[i * 7 + 1 + r], sep=" \t").reshape(1, -1)
            for r in range(6)], axis=0)
        info_list.append(mat)
    cov = np.asarray(info_list, dtype=np.float32).reshape(-1, dim, dim)
    return n_frame, cov


def write_trajectory(path: str, entries: Sequence[Tuple[str, str, np.ndarray]]):
    """Write Redwood-format entries (src_id, tgt_id, 4x4 INVERSE pose —
    the reference writes inv(est), ThreeDMatch/test.py:254-261).

    TRUNCATES: the harness rewrites each scene's trajectory once per run
    (the reference appends per-pair within a single pass); appending here
    would duplicate entries across reruns into the same log_dir and
    silently corrupt Registration Recall."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for src_id, tgt_id, trans in entries:
            f.write(f"{src_id}\t {tgt_id}\t  1\n")
            for r in range(4):
                f.write("\t ".join(str(trans[r, c]) for c in range(4))
                        + "\t \n")
