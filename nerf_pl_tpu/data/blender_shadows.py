"""Per-image shadow dataset (reference ``datasets/blender_shadows.py`` —
registry name ``shadows``), used by the image-space shadow-mapping trainer:
each item is a whole image of rays plus its camera PPC, the GT shadow map
``sm_<name>.png`` as the target, and the shared light rig.

Reference specifics kept: camera near/far 1/200 and light near/far
**100/500** (``blender_shadows.py:45-50``); ``white_back=False`` (``:22``).
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..ops.ray_utils import get_ray_directions
from .shadow_common import (
    LightRig,
    load_sm_image,
    make_rays,
    posed_ppc,
    sm_path_for,
)


class BlenderDatasetShadows:
    white_back = False

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        img_wh=(800, 800),
        val_num: int = 8,
        near: float = 1.0,
        far: float = 200.0,
        light_near: float = 100.0,
        light_far: float = 500.0,
    ):
        assert img_wh[0] == img_wh[1], "image width must equal image height!"
        self.root_dir = root_dir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.val_num = val_num
        self.near, self.far = near, far
        self.light_near, self.light_far = light_near, light_far
        self._read_meta()

    def _read_meta(self):
        with open(os.path.join(self.root_dir, f"transforms_{self.split}.json")) as f:
            self.meta = json.load(f)
        w, h = self.img_wh
        self.focal = 0.5 * 800 / np.tan(0.5 * self.meta["camera_angle_x"])
        self.focal *= w / 800.0
        self.directions = get_ray_directions(h, w, self.focal)
        l2w = np.array(
            self.meta["light_camera_transform_matrix"], dtype=np.float32
        )[:3, :4]
        self.light = LightRig(
            self.img_wh, self.meta["light_camera_angle_x"], l2w,
            self.light_near, self.light_far,
        )
        self.poses = [
            np.array(f["transform_matrix"], dtype=np.float32)[:3, :4]
            for f in self.meta["frames"]
        ]

    def __len__(self):
        if self.split == "train":
            return len(self.meta["frames"])
        if self.split == "val":
            return min(self.val_num, len(self.meta["frames"]))
        return len(self.meta["frames"])

    def __getitem__(self, idx: int):
        w, h = self.img_wh
        frame = self.meta["frames"][idx]
        c2w = self.poses[idx] if self.split == "train" else np.array(
            frame["transform_matrix"], dtype=np.float32
        )[:3, :4]
        M, eye = posed_ppc(self.meta["camera_angle_x"], (w, h), c2w)
        sm = load_sm_image(
            sm_path_for(self.root_dir, frame["file_path"]), self.img_wh
        )
        return {
            "rays": make_rays(self.directions, c2w, self.near, self.far),
            "rgbs": sm,
            "ppc": {"eye_pos": eye, "camera": M},
            "light_ppc": {
                "eye_pos": self.light.eye_pos,
                "camera": self.light.camera,
            },
            "light_rays": self.light.rays,
            "c2w": c2w,
        }
