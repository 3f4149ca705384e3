"""Miniature synthetic dataset trees in the REAL on-disk formats.

The environment ships no 3DMatch/KITTI/ETH data, so the dataset loaders'
format plumbing (overlap pkl, ``gt.log``/``gt.info`` parsing, ``.pose.npy``,
KITTI ``.bin`` + ``poses/NN.txt`` + ICP cache, ETH scene layout) would
otherwise never execute.  These generators write 2-4-fragment scenes whose
geometry is a consistent synthetic surface, so the full entry points
(``scripts/test.py``, ``scripts/train.py``) can run end-to-end on them.

Formats mirrored from the reference loaders:
  3DMatch train  — ThreeDMatch/dataset.py:25-48 (overlap pkl + pose.npy)
  3DMatch test   — ThreeDMatch/dataset.py:50-77 (gt_result/<scene>/gt.log)
  RR protocol    — ThreeDMatch/test.py:18-89 (gt.log + gt.info blocks)
  KITTI          — KITTI/dataset.py:45-117 (velodyne .bin, poses, ICP cache)
  ETH            — generalization/ThreeD2ETH/dataset.py:25-119
"""

from __future__ import annotations

import os
import pickle
from os.path import join

import numpy as np

from buffer_tpu.data.ply import write_ply_points


def surface_cloud(n: int, seed: int, span: float = 2.4,
                  z_scale: float = 1.0) -> np.ndarray:
    """A wavy surface patch with clutter — enough 3D structure for normals,
    pyramids, and patches to be non-degenerate."""
    rs = np.random.RandomState(seed)
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rs.uniform(-span / 2, span / 2, n)
    pts[:, 1] = rs.uniform(-span / 2, span / 2, n)
    pts[:, 2] = z_scale * (0.25 * np.sin(3.0 * pts[:, 0])
                           + 0.2 * np.cos(4.0 * pts[:, 1]))
    # 10% clutter off the surface
    m = n // 10
    pts[:m, 2] += rs.uniform(0.05, 0.4, m) * z_scale
    pts += rs.randn(n, 3).astype(np.float32) * 0.003 * z_scale
    return pts.astype(np.float32)


def _pose(rs: np.random.RandomState, max_angle: float = 0.5,
          max_t: float = 0.4) -> np.ndarray:
    axis = rs.randn(3)
    axis /= np.linalg.norm(axis)
    ang = rs.uniform(0.1, max_angle)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rs.uniform(-max_t, max_t, 3)
    return T


def _crop(world: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Overlapping x-slabs of the world cloud -> fragments."""
    sel = (world[:, 0] >= lo) & (world[:, 0] <= hi)
    return world[sel]


def _write_log(path: str, entries, n_total: int) -> None:
    """gt.log blocks: 'i j n' + 4x4 (redwood format)."""
    with open(path, "w") as f:
        for i, j, T in entries:
            f.write(f"{i}\t{j}\t{n_total}\n")
            for r in range(4):
                f.write("\t".join(f"{T[r, c]:.8f}" for c in range(4)) + "\n")


def _write_info(path: str, entries, n_total: int, scale: float = 100.0) -> None:
    """gt.info blocks: 'i j n' + 6x6 covariance (ThreeDMatch/test.py:58-89)."""
    info = np.eye(6) * scale
    with open(path, "w") as f:
        for i, j, _ in entries:
            f.write(f"{i}\t{j}\t{n_total}\n")
            for r in range(6):
                f.write("\t".join(f"{info[r, c]:.6f}" for c in range(6)) + "\n")


def make_threedmatch_tree(root: str, seed: int = 0, n_world: int = 9000):
    """<root>/train/<scene>/cloud_bin_{0,1}.ply + .pose.npy + overlap pkl +
    {train,val}_3dmatch.txt; <root>/test/3DMatch/{fragments,gt_result}/...

    Returns the scene name used for the test split.
    """
    rs = np.random.RandomState(seed)
    world = surface_cloud(n_world, seed)

    # ---- train split: one scene, two overlapping fragments in LOCAL frames
    scene = "fixture-scene-a"
    tdir = join(root, "train", scene)
    os.makedirs(tdir, exist_ok=True)
    frags = [_crop(world, -1.2, 0.5), _crop(world, -0.5, 1.2)]
    keys = []
    for i, frag in enumerate(frags):
        pose = _pose(rs)                       # local -> world
        local = (frag - pose[:3, 3]) @ pose[:3, :3]
        write_ply_points(join(tdir, f"cloud_bin_{i}.ply"), local)
        np.save(join(tdir, f"cloud_bin_{i}.pose.npy"), pose)
        keys.append(f"{scene}/cloud_bin_{i}")
    overlap = {f"{keys[0]}@{keys[1]}": 0.62}
    with open(join(root, "train", "3DMatch_train_overlap.pkl"), "wb") as f:
        pickle.dump(overlap, f)
    for split in ("train", "val"):
        with open(join(root, "train", f"{split}_3dmatch.txt"), "w") as f:
            f.write(scene + "\n")

    # ---- test split: one scene, 4 fragments, gt pairs incl. non-consecutive
    tscene = "fixture-scene-test"
    fdir = join(root, "test", "3DMatch", "fragments", tscene)
    gdir = join(root, "test", "3DMatch", "gt_result", tscene)
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    slabs = [(-1.2, -0.1), (-0.7, 0.4), (-0.2, 0.9), (0.3, 1.2)]
    poses = []
    for i, (lo, hi) in enumerate(slabs):
        pose = _pose(rs)
        local = (_crop(world, lo, hi) - pose[:3, 3]) @ pose[:3, :3]
        write_ply_points(join(fdir, f"cloud_bin_{i}.ply"), local)
        poses.append(pose)
    # relt (src i -> tgt j frame) = inv(pose_j) @ pose_i; gt.log stores its
    # inverse (the dataset does relt = inv(gt), ThreeDMatch/dataset.py:77)
    pairs = [(0, 1), (0, 2), (1, 3)]
    entries = []
    for i, j in pairs:
        relt = np.linalg.inv(poses[j]) @ poses[i]
        entries.append((i, j, np.linalg.inv(relt)))
    _write_log(join(gdir, "gt.log"), entries, 4)
    _write_info(join(gdir, "gt.info"), entries, 4)
    return tscene


def make_kitti_tree(root: str, seed: int = 0, n_world: int = 16000):
    """<root>/dataset/sequences/08/velodyne/*.bin + poses/08.txt +
    {train,val,test}_kitti.txt.  Three scans along a straight cam
    trajectory; scan geometry is the world surface expressed in each velo
    frame, so the velo2cam-chained GT is self-consistent."""
    from buffer_tpu.data.kitti import velo2cam

    rs = np.random.RandomState(seed + 7)
    seq = join(root, "dataset", "sequences", "08", "velodyne")
    os.makedirs(seq, exist_ok=True)
    os.makedirs(join(root, "dataset", "poses"), exist_ok=True)

    world = surface_cloud(n_world, seed + 1, span=40.0, z_scale=6.0)
    Vc = velo2cam().T                           # true velo->cam (un-transposed)

    cam_poses = []
    rows = []
    for t, x in enumerate((0.0, 6.0, 12.0)):    # first >10m jump at scan 2
        P = np.eye(4)
        P[0, 3] = x                             # cam pose: pure translation
        cam_poses.append(P)
        rows.append(" ".join(f"{v:.6e}" for v in P[:3].reshape(-1)))
    with open(join(root, "dataset", "poses", "08.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")

    for t, P in enumerate(cam_poses):
        # world (velo frame 0) -> velo frame t:  M = Vc^-1 P_t^-1 P_0 Vc
        M = np.linalg.inv(Vc) @ np.linalg.inv(P) @ cam_poses[0] @ Vc
        scan = world @ M[:3, :3].T + M[:3, 3]
        # per-scan decimation + noise so scans aren't bit-identical
        keep = rs.rand(len(scan)) > 0.15
        scan = scan[keep] + rs.randn(keep.sum(), 3).astype(np.float32) * 0.01
        arr = np.concatenate(
            [scan.astype(np.float32),
             np.zeros((len(scan), 1), np.float32)], axis=1)  # reflectance col
        arr.tofile(join(seq, f"{t:06d}.bin"))

    for split in ("train", "val", "test"):
        with open(join(root, f"{split}_kitti.txt"), "w") as f:
            f.write("8\n")


def make_eth_tree(root: str, seed: int = 0, n_world: int = 9000):
    """<root>/<scene>/Hokuyo_{0,1}.ply + gt.log for each of the four ETH
    scenes (one real pair in gazebo_summer; empty gt.log elsewhere)."""
    from buffer_tpu.data.eth import ETH_SCENES

    rs = np.random.RandomState(seed + 13)
    world = surface_cloud(n_world, seed + 2, span=12.0, z_scale=3.0)
    for k, scene in enumerate(ETH_SCENES):
        sdir = join(root, scene)
        os.makedirs(sdir, exist_ok=True)
        if k > 0:
            open(join(sdir, "gt.log"), "w").close()
            continue
        poses = [_pose(rs, max_t=1.5), _pose(rs, max_t=1.5)]
        slabs = [(-6.0, 2.0), (-2.0, 6.0)]
        for i, (lo, hi) in enumerate(slabs):
            local = (_crop(world, lo, hi) - poses[i][:3, 3]) @ poses[i][:3, :3]
            write_ply_points(join(sdir, f"Hokuyo_{i}.ply"), local)
        relt = np.linalg.inv(poses[1]) @ poses[0]
        _write_log(join(sdir, "gt.log"), [(0, 1, np.linalg.inv(relt))], 2)
