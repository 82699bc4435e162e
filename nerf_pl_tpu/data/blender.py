"""Blender synthetic dataset (NeRF ``transforms_*.json`` format).

Behavioral contract (reference ``datasets/blender.py``):
  * focal = ``0.5 * 800 / tan(0.5 * camera_angle_x)`` scaled by ``w/800``
    (``datasets/blender.py:34-37``).
  * train split: one flattened buffer of all rays ``(n_imgs*h*w, 8)`` holding
    ``[o, d, near, far]`` and RGBA-over-white blended rgbs
    (``datasets/blender.py:54-90``).
  * val split: 8 per-image samples with a ``valid_mask`` from the alpha
    channel (``datasets/blender.py:100,108-136``).
  * ``black_and_white`` converts to replicated-channel grayscale
    (``datasets/blender.py:68-72``).

Documented fork quirks handled differently (SURVEY.md §7):
  * near/far are constructor arguments (upstream 2/6 default) instead of the
    fork's hardcoded 1/200 behind an interactive ``input()`` gate
    (``datasets/blender.py:40-44``) — pass ``near=1, far=200`` to reproduce.
  * ``white_back`` is an argument (fork pins it ``False``,
    ``datasets/blender.py:21``; upstream uses ``True``).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
from PIL import Image

from .shadow_common import make_rays
from ..ops.ray_utils import get_ray_directions


def _load_image(path, img_wh, black_and_white=False):
    """Returns (h*w, 4) float32 RGBA in [0,1] (grayscale replicated if bw)."""
    img = Image.open(path)
    img = img.resize(img_wh, Image.LANCZOS)
    if black_and_white:
        alpha = None
        if img.mode == "RGBA":
            alpha = np.asarray(img, dtype=np.float32)[..., 3] / 255.0
        g = np.asarray(img.convert("L"), dtype=np.float32) / 255.0
        rgb = np.stack([g, g, g], axis=-1)
        a = alpha if alpha is not None else np.ones_like(g)
        return np.concatenate([rgb, a[..., None]], -1).reshape(-1, 4)
    img = np.asarray(img.convert("RGBA"), dtype=np.float32) / 255.0
    return img.reshape(-1, 4)


def blend_rgba(img: np.ndarray) -> np.ndarray:
    """``rgb*a + (1-a)`` — blend alpha over white. The reference blends over
    white UNCONDITIONALLY, even with white_back=False (datasets/blender.py:
    77-80), so there is deliberately no background parameter here."""
    rgb, a = img[:, :3], img[:, 3:4]
    return rgb * a + (1.0 - a)


class BlenderDataset:
    white_back_default = True

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        img_wh=(800, 800),
        near: float = 2.0,
        far: float = 6.0,
        white_back: Optional[bool] = None,
        black_and_white: bool = False,
        val_num: int = 8,
        frame_shard=None,
    ):
        assert img_wh[0] == img_wh[1], "image width must equal image height!"
        self.root_dir = root_dir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.near, self.far = float(near), float(far)
        self.white_back = (
            self.white_back_default if white_back is None else bool(white_back)
        )
        self.black_and_white = black_and_white
        self.val_num = val_num
        # (offset, step): load only frames[offset::step] — the pod-scale
        # host data pipeline (SURVEY.md §7): each host reads its own image
        # subset instead of materializing the full all-rays buffer
        self.frame_shard = frame_shard
        self._read_meta()

    # -- meta -----------------------------------------------------------------
    def _read_meta(self):
        with open(os.path.join(self.root_dir, f"transforms_{self.split}.json")) as f:
            self.meta = json.load(f)
        w, h = self.img_wh
        self.focal = 0.5 * 800 / np.tan(0.5 * self.meta["camera_angle_x"])
        self.focal *= w / 800.0
        self.bounds = np.array([self.near, self.far], dtype=np.float32)
        self.directions = get_ray_directions(h, w, self.focal)  # (h, w, 3)

        if self.split == "train":
            frames = self.meta["frames"]
            if self.frame_shard is not None:
                from .sharding import wrap_pad_shard

                frames = wrap_pad_shard(frames, self.frame_shard)
            rays, rgbs, poses, paths = [], [], [], []
            for frame in frames:
                pose = np.array(frame["transform_matrix"], dtype=np.float32)[:3, :4]
                poses.append(pose)
                path = os.path.join(self.root_dir, f"{frame['file_path']}.png")
                paths.append(path)
                img = _load_image(path, self.img_wh, self.black_and_white)
                # reference bw branch is RAW replicated grayscale with NO
                # alpha blend (datasets/blender.py:68-72)
                rgbs.append(img[:, :3] if self.black_and_white
                            else blend_rgba(img))
                rays.append(
                    make_rays(self.directions, pose, self.near, self.far)
                )
            self.poses = np.stack(poses)
            self.image_paths = paths
            self.all_rays = np.concatenate(rays, 0).astype(np.float32)
            self.all_rgbs = np.concatenate(rgbs, 0).astype(np.float32)

    # -- sized access ----------------------------------------------------------
    def __len__(self):
        if self.split == "train":
            return len(self.all_rays)
        if self.split == "val":
            return min(self.val_num, len(self.meta["frames"]))
        return len(self.meta["frames"])

    def __getitem__(self, idx: int):
        if self.split == "train":
            return {"rays": self.all_rays[idx], "rgbs": self.all_rgbs[idx]}
        frame = self.meta["frames"][idx]
        c2w = np.array(frame["transform_matrix"], dtype=np.float32)[:3, :4]
        path = os.path.join(self.root_dir, f"{frame['file_path']}.png")
        img = _load_image(path, self.img_wh, self.black_and_white)
        valid_mask = img[:, 3] > 0
        rgbs = img[:, :3] if self.black_and_white else blend_rgba(img)
        rays = make_rays(self.directions, c2w, self.near, self.far)
        return {
            "rays": rays,
            "rgbs": rgbs.astype(np.float32),
            "c2w": c2w,
            "valid_mask": valid_mask,
        }
