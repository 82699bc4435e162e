"""LLFF (real forward-facing / spheric) dataset (reference
``datasets/llff.py``).

Behavioral contract:
  * ``poses_bounds.npy`` rows = 3x5 pose (+H, W, focal) and 2 depth bounds
    (``llff.py:177-189``); focal rescaled to ``img_wh``.
  * Pose correction "down right back" → "right up back" (``llff.py:198``),
    then centering by the inverse average pose (``average_poses`` /
    ``center_poses``, ``llff.py:17-80``).
  * Scale so the nearest depth sits at ~1.33 (``bounds/scale``, ``llff.py:
    205-211``).
  * Val image = pose closest to the center (``llff.py:201-203``); ``val_num``
    replicates it for multi-device validation (``llff.py:164,170``).
  * Forward-facing → NDC rays with near/far 0/1 (``llff.py:236-242``);
    spheric → near = min bound, far = min(8*near, max bound) (``:243-245``).
  * Test paths: spiral (fwd-facing, ``create_spiral_poses`` ``llff.py:
    83-115``) or spheric circle (``create_spheric_poses`` ``llff.py:
    118-156``); ``split='test_train'`` renders the training poses.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from ..ops.ray_utils import get_ndc_rays, get_ray_directions, get_rays


def normalize(v):
    return v / np.linalg.norm(v)


def average_poses(poses: np.ndarray) -> np.ndarray:
    """(N, 3, 4) -> (3, 4) average pose (center/z/y'/x recipe)."""
    center = poses[..., 3].mean(0)
    z = normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses: np.ndarray):
    pose_avg = average_poses(poses)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    last_row = np.tile(np.array([0, 0, 0, 1]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    poses_centered = np.linalg.inv(pose_avg_homo) @ poses_homo
    return poses_centered[:, :3], np.linalg.inv(pose_avg_homo)


def create_spiral_poses(radii, focus_depth, n_poses: int = 120) -> np.ndarray:
    poses_spiral = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = normalize(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0, 1, 0])
        x = normalize(np.cross(y_, z))
        y = np.cross(z, x)
        poses_spiral.append(np.stack([x, y, z, center], 1))
    return np.stack(poses_spiral, 0)


def create_spheric_poses(radius, n_poses: int = 120) -> np.ndarray:
    def spheric_pose(theta, phi, radius):
        trans_t = np.array(
            [[1, 0, 0, 0], [0, 1, 0, -0.9 * radius], [0, 0, 1, radius], [0, 0, 0, 1]]
        )
        rot_phi = np.array(
            [[1, 0, 0, 0],
             [0, np.cos(phi), -np.sin(phi), 0],
             [0, np.sin(phi), np.cos(phi), 0],
             [0, 0, 0, 1]]
        )
        rot_theta = np.array(
            [[np.cos(theta), 0, -np.sin(theta), 0],
             [0, 1, 0, 0],
             [np.sin(theta), 0, np.cos(theta), 0],
             [0, 0, 0, 1]]
        )
        c2w = rot_theta @ rot_phi @ trans_t
        c2w = (
            np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]])
            @ c2w
        )
        return c2w[:3]

    return np.stack(
        [
            spheric_pose(th, -np.pi / 5, radius)
            for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
        ],
        0,
    )


def _load_rgb(path, img_wh):
    img = Image.open(path).convert("RGB")
    assert img.size[1] * img_wh[0] == img.size[0] * img_wh[1], (
        f"{path} has different aspect ratio than img_wh, please check your data!"
    )
    img = img.resize(img_wh, Image.LANCZOS)
    return (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1, 3)


class LLFFDataset:
    white_back = False

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        img_wh=(504, 378),
        spheric_poses: bool = False,
        val_num: int = 1,
        frame_shard=None,
    ):
        self.root_dir = root_dir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.spheric_poses = spheric_poses
        self.val_num = max(1, val_num)
        # (offset, step): load images for train indices[offset::step] only.
        # Pose centering/scaling still uses ALL poses (tiny), so per-host
        # subsets see identical geometry normalization.
        self.frame_shard = frame_shard
        self._read_meta()

    def _rays_for(self, c2w: np.ndarray) -> np.ndarray:
        rays_o, rays_d = get_rays(self.directions, c2w.astype(np.float32))
        if not self.spheric_poses:
            near, far = 0.0, 1.0
            rays_o, rays_d = get_ndc_rays(
                self.img_wh[1], self.img_wh[0], self.focal, 1.0, rays_o, rays_d
            )
        else:
            near = self.bounds.min()
            far = min(8 * near, self.bounds.max())
        nf = np.ones_like(rays_o[:, :1])
        return np.concatenate(
            [rays_o, rays_d, near * nf, far * nf], 1
        ).astype(np.float32)

    def _read_meta(self):
        poses_bounds = np.load(os.path.join(self.root_dir, "poses_bounds.npy"))
        self.image_paths = sorted(glob.glob(os.path.join(self.root_dir, "images/*")))
        if self.split in ["train", "val"]:
            assert len(poses_bounds) == len(self.image_paths), (
                "Mismatch between number of images and number of poses! "
                "Please rerun COLMAP!"
            )
        poses = poses_bounds[:, :15].reshape(-1, 3, 5)
        self.bounds = poses_bounds[:, -2:]

        H, W, self.focal = poses[0, :, -1]
        assert H * self.img_wh[0] == W * self.img_wh[1], (
            f"You must set @img_wh to have the same aspect ratio as ({W}, {H}) !"
        )
        self.focal *= self.img_wh[0] / W

        poses = np.concatenate(
            [poses[..., 1:2], -poses[..., :1], poses[..., 2:4]], -1
        )
        self.poses, self.pose_avg = center_poses(poses)
        distances = np.linalg.norm(self.poses[..., 3], axis=1)
        val_idx = int(np.argmin(distances))

        near_original = self.bounds.min()
        scale_factor = near_original * 0.75
        self.bounds /= scale_factor
        self.poses[..., 3] /= scale_factor

        self.directions = get_ray_directions(
            self.img_wh[1], self.img_wh[0], self.focal
        )

        if self.split == "train":
            train_idx = [
                i for i in range(len(self.image_paths)) if i != val_idx
            ]
            if self.frame_shard is not None:
                from .sharding import wrap_pad_shard

                train_idx = wrap_pad_shard(
                    train_idx, self.frame_shard, what="images"
                )
            rays, rgbs = [], []
            for i in train_idx:
                rgbs.append(_load_rgb(self.image_paths[i], self.img_wh))
                rays.append(self._rays_for(self.poses[i]))
            self.all_rays = np.concatenate(rays, 0)
            self.all_rgbs = np.concatenate(rgbs, 0)
        elif self.split == "val":
            self.c2w_val = self.poses[val_idx]
            self.image_path_val = self.image_paths[val_idx]
        else:
            if self.split.endswith("train"):
                self.poses_test = self.poses
            elif not self.spheric_poses:
                focus_depth = 3.5
                radii = np.percentile(np.abs(self.poses[..., 3]), 90, axis=0)
                self.poses_test = create_spiral_poses(radii, focus_depth)
            else:
                radius = 1.1 * self.bounds.min()
                self.poses_test = create_spheric_poses(radius)

    def __len__(self):
        if self.split == "train":
            return len(self.all_rays)
        if self.split == "val":
            return self.val_num
        return len(self.poses_test)

    def __getitem__(self, idx: int):
        if self.split == "train":
            return {"rays": self.all_rays[idx], "rgbs": self.all_rgbs[idx]}
        if self.split == "val":
            c2w = self.c2w_val
        else:
            c2w = self.poses_test[idx]
        sample = {"rays": self._rays_for(c2w), "c2w": c2w.astype(np.float32)}
        if self.split == "val":
            sample["rgbs"] = _load_rgb(self.image_path_val, self.img_wh)
            sample["valid_mask"] = np.ones(
                self.img_wh[0] * self.img_wh[1], bool
            )
        return sample
