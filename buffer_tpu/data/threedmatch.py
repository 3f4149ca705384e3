"""3DMatch / 3DLoMatch fragment-pair datasets.

Mirrors ``ThreeDMatch/dataset.py``: training pairs come from the
Predator-processed overlap pickle under ``<root>/train``; test pairs from
the eight benchmark scenes' ``gt.log`` files.  Geometry preprocessing
(double voxel downsample, SO(3) augmentation of the target, jitter, point
caps, padding) is shared host code in :mod:`buffer_tpu.data.preprocess`.

Returns plain numpy dicts; device batching happens in the caller.
"""

from __future__ import annotations

import os
import pickle
from os.path import join
from typing import Dict, List

import numpy as np

from buffer_tpu.config import Config
from buffer_tpu.core import se3
from buffer_tpu.data.ply import read_ply_points
from buffer_tpu.eval.metrics import load_log
from buffer_tpu.kernels.host import voxel_subsample_host

TEST_SCENES = [
    "7-scenes-redkitchen",
    "sun3d-home_at-home_at_scan1_2013_jan_1",
    "sun3d-home_md-home_md_scan9_2012_sep_30",
    "sun3d-hotel_uc-scan3",
    "sun3d-hotel_umd-maryland_hotel1",
    "sun3d-hotel_umd-maryland_hotel3",
    "sun3d-mit_76_studyroom-76-1studyroom2",
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
]


def _np_rotation(rs: np.ndarray, num_axis: int) -> np.ndarray:
    """Host-side random rotation matching utils/SE3.py:5-30."""
    angles = rs.rand(3) * 2 * np.pi
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    if num_axis == 0:
        return np.eye(3)
    if num_axis == 1:
        return Rz
    return Rx @ Ry @ Rz


class ThreeDMatchDataset:
    """split in {'train', 'val', 'test'} (ThreeDMatch/dataset.py:25-77)."""

    def __init__(self, split: str, config: Config):
        self.config = config
        self.split = split
        self.files: List[List[str]] = []
        self.poses: List[np.ndarray] = []
        root = config.data.root
        if split != "test":
            self.root = join(root, "train")
            with open(join(self.root, "3DMatch_train_overlap.pkl"), "rb") as f:
                overlap = pickle.load(f)
            scene_list = open(join(self.root, f"{split}_3dmatch.txt")).read().split()
            for key in overlap:
                src_id, tgt_id = key.split("@")
                if src_id.split("/")[0] in scene_list:
                    self.files.append([src_id, tgt_id])
        else:
            self.root = join(root, "test")
            if config.data.dataset == "3DMatch":
                gtbase = join(self.root, "3DMatch", "gt_result")
            else:  # 3DLoMatch
                gtbase = join(self.root, "3DLoMatch")
            # canonical benchmark scenes when present; otherwise discover
            # from disk (lets CI fixture trees drive the identical path)
            scenes = [s for s in TEST_SCENES
                      if os.path.isdir(join(gtbase, s))]
            if not scenes and os.path.isdir(gtbase):
                scenes = sorted(
                    s for s in os.listdir(gtbase)
                    if os.path.isdir(join(gtbase, s)))
            for scene in scenes:
                gtpath = join(gtbase, scene)
                gt = load_log(join(gtpath, "gt.log"))
                pcdpath = f"3DMatch/fragments/{scene}"
                for key, pose in gt.items():
                    id1, id2 = key.split("_")
                    self.files.append([join(pcdpath, f"cloud_bin_{id1}"),
                                       join(pcdpath, f"cloud_bin_{id2}")])
                    self.poses.append(pose)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int) -> Dict:
        cfg = self.config
        rs = np.random.RandomState()
        src_id, tgt_id = self.files[index]
        if self.split != "test" and rs.rand() > 0.5:
            src_id, tgt_id = tgt_id, src_id

        src_pts = read_ply_points(join(self.root, src_id) + ".ply")
        src_pts = voxel_subsample_host(src_pts, cfg.data.downsample)
        tgt_pts = read_ply_points(join(self.root, tgt_id) + ".ply")
        tgt_pts = voxel_subsample_host(tgt_pts, cfg.data.downsample)

        if self.split != "test":
            R = _np_rotation(rs, 3)
            aug = np.eye(4)
            aug[:3, :3] = R
            tgt_pts = tgt_pts @ R.T
            src_pose = np.load(join(self.root, src_id) + ".pose.npy")
            tgt_pose = np.load(join(self.root, tgt_id) + ".pose.npy")
            relt_pose = aug @ np.linalg.inv(tgt_pose) @ src_pose
            noise = cfg.train.augmentation_noise
            src_pts = src_pts + (rs.rand(*src_pts.shape) - 0.5) * noise
            tgt_pts = tgt_pts + (rs.rand(*tgt_pts.shape) - 0.5) * noise
        else:
            relt_pose = np.linalg.inv(self.poses[index])

        return {
            "src_fds_pts": src_pts.astype(np.float32),
            "tgt_fds_pts": tgt_pts.astype(np.float32),
            "relt_pose": relt_pose.astype(np.float32),
            "src_id": src_id,
            "tgt_id": tgt_id,
        }
