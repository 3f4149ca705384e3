"""KITTI odometry registration pairs.

Mirrors ``KITTI/dataset.py``: pairs of velodyne scans >= 10 m apart mined
from the odometry poses, ground truth = velo2cam-chained pose refined by
point-to-point ICP and cached to ``<root>/icp/<key>.npy``; SO(3)
augmentation when training the Ref stage, SO(2) (z-only) otherwise; known
bad test pair (8, 15, 58) removed.

The Open3D ICP call (KITTI/dataset.py:104-108) is replaced by
:func:`icp_point_to_point` (scipy cKDTree correspondences + Kabsch).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple

import numpy as np

from buffer_tpu.config import Config
from buffer_tpu.data.threedmatch import _np_rotation
from buffer_tpu.kernels.host import voxel_subsample_host

_VELO2CAM = None


def velo2cam() -> np.ndarray:
    """Velodyne -> camera extrinsics, TRANSPOSED like the reference property
    (KITTI/dataset.py:196-208)."""
    global _VELO2CAM
    if _VELO2CAM is None:
        R = np.array([
            7.533745e-03, -9.999714e-01, -6.166020e-04, 1.480249e-02,
            7.280733e-04, -9.998902e-01, 9.998621e-01, 7.523790e-03,
            1.480755e-02]).reshape(3, 3)
        T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01]).reshape(3, 1)
        _VELO2CAM = np.vstack((np.hstack([R, T]), [0, 0, 0, 1])).T
    return _VELO2CAM


def icp_point_to_point(src: np.ndarray, tgt: np.ndarray, max_dist: float = 0.20,
                       max_iter: int = 200, tol: float = 1e-7) -> np.ndarray:
    """Point-to-point ICP: NN correspondences within max_dist + Kabsch.
    Same role as o3d.registration_icp in the reference GT refinement."""
    from scipy.spatial import cKDTree

    tree = cKDTree(tgt)
    T = np.eye(4)
    cur = src.copy()
    prev_err = np.inf
    for _ in range(max_iter):
        d, nn = tree.query(cur, k=1, distance_upper_bound=max_dist)
        ok = np.isfinite(d)
        if ok.sum() < 10:
            break
        a, b = cur[ok], tgt[nn[ok]]
        ca, cb = a.mean(0), b.mean(0)
        H = (a - ca).T @ (b - cb)
        U, S, Vt = np.linalg.svd(H)
        D = np.diag([1.0, 1.0, np.linalg.det(Vt.T @ U.T)])
        R = Vt.T @ D @ U.T
        t = cb - R @ ca
        step = np.eye(4)
        step[:3, :3], step[:3, 3] = R, t
        cur = cur @ R.T + t
        T = step @ T
        err = float((d[ok] ** 2).mean())
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return T


class KITTIDataset:
    DATA_FILES = {"train": "train_kitti.txt", "val": "val_kitti.txt",
                  "test": "test_kitti.txt"}
    # sequence splits (standard KITTI odometry registration protocol)
    DEFAULT_SEQS = {"train": range(0, 6), "val": range(6, 8),
                    "test": range(8, 11)}

    def __init__(self, split: str, config: Config):
        self.config = config
        self.split = split
        self.pc_path = os.path.join(config.data.root, "dataset")
        self.icp_path = os.path.join(config.data.root, "icp")
        os.makedirs(self.icp_path, exist_ok=True)
        self.files: List[Tuple[int, int, int]] = []
        self._odometry_cache: Dict[int, np.ndarray] = {}
        self._mine_pairs(split)

    def _seq_list(self, split: str):
        path = os.path.join(self.config.data.root, self.DATA_FILES[split])
        if os.path.exists(path):
            return [int(s) for s in open(path).read().split()]
        return list(self.DEFAULT_SEQS[split])

    def _mine_pairs(self, split: str):
        """>= 10 m apart pair mining (KITTI/dataset.py:45-75)."""
        for drive_id in self._seq_list(split):
            fnames = glob.glob(
                self.pc_path + "/sequences/%02d/velodyne/*.bin" % drive_id)
            if not fnames:
                continue
            inames = sorted(int(os.path.split(f)[-1][:-4]) for f in fnames)
            all_pos = self.get_positions(drive_id)
            Ts = all_pos[:, :3, 3]
            pdist = np.sqrt(((Ts[None] - Ts[:, None]) ** 2).sum(-1))
            more_than_10 = pdist > 10
            curr = inames[0]
            while curr in inames:
                nxt = np.where(more_than_10[curr][curr:curr + 100])[0]
                if len(nxt) == 0:
                    curr += 1
                    continue
                nxt = int(nxt[0]) + curr - 1
                if nxt in inames:
                    self.files.append((drive_id, curr, nxt))
                    curr = nxt + 1
                else:
                    curr += 1
        if split == "test" and (8, 15, 58) in self.files:
            self.files.remove((8, 15, 58))  # known-bad pair (dataset.py:72)

    def get_positions(self, drive: int) -> np.ndarray:
        if drive not in self._odometry_cache:
            data = np.genfromtxt(self.pc_path + "/poses/%02d.txt" % drive)
            poses = np.concatenate(
                [data.reshape(-1, 3, 4),
                 np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(data), 1, 1))],
                axis=1)
            self._odometry_cache[drive] = poses
        return self._odometry_cache[drive]

    def _velodyne(self, drive: int, t: int) -> np.ndarray:
        fname = self.pc_path + "/sequences/%02d/velodyne/%06d.bin" % (drive, t)
        return np.fromfile(fname, dtype=np.float32).reshape(-1, 4)[:, :3]

    def gt_pose(self, drive: int, t0: int, t1: int,
                xyz0: np.ndarray, xyz1: np.ndarray) -> np.ndarray:
        """ICP-refined ground truth, disk-cached (KITTI/dataset.py:95-117)."""
        key = "%d_%d_%d" % (drive, t0, t1)
        fname = os.path.join(self.icp_path, key + ".npy")
        if os.path.exists(fname):
            return np.load(fname)
        pos = self.get_positions(drive)
        M = (velo2cam() @ pos[t0].T @ np.linalg.inv(pos[t1].T)
             @ np.linalg.inv(velo2cam())).T
        xyz0_t = xyz0 @ M[:3, :3].T + M[:3, 3]
        # subsample for ICP speed; GT refinement needs ~cm accuracy
        sub0 = voxel_subsample_host(xyz0_t.astype(np.float32), 0.05)
        sub1 = voxel_subsample_host(xyz1.astype(np.float32), 0.05)
        reg = icp_point_to_point(sub0, sub1, max_dist=0.20, max_iter=200)
        # composition order follows the reference (KITTI/dataset.py:110,
        # inherited from the FCGF-family loaders): M2 = M @ T_icp
        M2 = M @ reg
        np.save(fname, M2)
        return M2

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int) -> Dict:
        cfg = self.config
        rs = np.random.RandomState()
        drive, t0, t1 = self.files[index]
        xyz0 = self._velodyne(drive, t0)
        xyz1 = self._velodyne(drive, t1)
        trans = self.gt_pose(drive, t0, t1, xyz0, xyz1)

        if self.split != "test":
            noise = cfg.train.augmentation_noise
            xyz0 = xyz0 + (rs.rand(*xyz0.shape) - 0.5) * noise
            xyz1 = xyz1 + (rs.rand(*xyz1.shape) - 0.5) * noise

        src = voxel_subsample_host(xyz0.astype(np.float32), cfg.data.downsample)
        tgt = voxel_subsample_host(xyz1.astype(np.float32), cfg.data.downsample)

        if self.split != "test":
            # SO(3) for Ref, SO(2) otherwise (KITTI/dataset.py:132-141)
            R = _np_rotation(rs, 3 if cfg.stage == "Ref" else 1)
            aug = np.eye(4)
            aug[:3, :3] = R
            tgt = tgt @ R.T
            relt_pose = aug @ trans
        else:
            relt_pose = trans

        return {
            "src_fds_pts": src.astype(np.float32),
            "tgt_fds_pts": tgt.astype(np.float32),
            "relt_pose": relt_pose.astype(np.float32),
            "src_id": f"{drive:02d}/{t0}",
            "tgt_id": f"{drive:02d}/{t1}",
        }
