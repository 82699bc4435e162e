"""Test harness: force a virtual 8-device CPU backend BEFORE jax initializes
(SURVEY.md §4: the standard trick for exercising pjit/shard_map collectives
without TPU hardware).

NOTE: environments that pre-import jax via sitecustomize (e.g. a TPU-plugin
image) ignore a late JAX_PLATFORMS env var — ``jax.config.update`` still
works as long as no backend has been initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np
import pytest


@pytest.fixture(scope="session")
def blender_root(tmp_path_factory):
    """A tiny synthetic Blender-format scene (3 train / 2 val / 2 test frames
    of a procedurally shaded 16x16 sphere on transparent background)."""
    return make_blender_scene(tmp_path_factory.mktemp("blender_scene"))


@pytest.fixture(scope="session")
def blender_root4(tmp_path_factory):
    """4-train-frame variant for uneven 3-process frame shards (2/1/1)."""
    return make_blender_scene(
        tmp_path_factory.mktemp("blender_scene4"), n_train=4
    )


def make_blender_scene(root, n_train=3, wh=16):
    from PIL import Image

    rng = np.random.RandomState(0)

    def pose(theta):
        # camera on a circle of radius 4 looking at origin (y-up blender-ish)
        c, s = np.cos(theta), np.sin(theta)
        eye = np.array([4 * s, 0.5, 4 * c], np.float32)
        fwd = eye / np.linalg.norm(eye)  # back vector
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, fwd, eye
        return m

    for split, n in [("train", n_train), ("val", 2), ("test", 2)]:
        frames = []
        (root / split).mkdir(exist_ok=True)
        for i in range(n):
            theta = 2 * np.pi * (i + (0 if split == "train" else 0.5)) / max(n, 1)
            m = pose(theta)
            # a blobby image with alpha disc in the middle
            yy, xx = np.mgrid[0:wh, 0:wh].astype(np.float32) / wh - 0.5
            r = np.sqrt(xx**2 + yy**2)
            alpha = (r < 0.35).astype(np.float32)
            img = np.zeros((wh, wh, 4), np.float32)
            img[..., 0] = 0.5 + 0.5 * np.cos(theta)
            img[..., 1] = 0.3
            img[..., 2] = 0.5 + 0.5 * np.sin(theta)
            img[..., 3] = alpha
            img += rng.rand(wh, wh, 4) * 0.05
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            name = f"{split}/r_{i}"
            Image.fromarray(img, "RGBA").save(root / f"{name}.png")
            frames.append(
                {"file_path": f"./{name}", "transform_matrix": m.tolist()}
            )
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(root)


@pytest.fixture(scope="session")
def shadow_root(tmp_path_factory):
    """A tiny synthetic shadow scene: RGB frames + sm_*.png shadow-map
    targets + a light camera in the meta (efficient_sm/rgb_sm format)."""
    return make_shadow_scene(tmp_path_factory.mktemp("shadow_scene"))


@pytest.fixture(scope="session")
def shadow_root4(tmp_path_factory):
    """4-train-frame variant: frames[p::3] shards UNEVENLY over 3 hosts
    (2/1/1) — exercises the wrap-pad + row-equalization path that never
    occurs at 2 processes on a multiple-of-2 frame count."""
    return make_shadow_scene(
        tmp_path_factory.mktemp("shadow_scene4"), n_train=4
    )


def make_shadow_scene(root, n_train=3, wh=8):
    from PIL import Image

    rng = np.random.RandomState(1)

    def pose(theta, height=0.5, r=4.0):
        c, s = np.cos(theta), np.sin(theta)
        eye = np.array([r * s, height, r * c], np.float32)
        fwd = eye / np.linalg.norm(eye)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, fwd, eye
        return m

    light_pose = pose(1.0, height=3.0, r=5.0)
    for split, n in [("train", n_train), ("val", 2), ("test", 1)]:
        frames = []
        for i in range(n):
            theta = 2 * np.pi * (i + (0.25 if split != "train" else 0)) / max(n, 1)
            m = pose(theta)
            rgba = (rng.rand(wh, wh, 4) * 255).astype(np.uint8)
            rgba[..., 3] = 255
            name = f"r_{split}_{i}"
            Image.fromarray(rgba, "RGBA").save(root / f"{name}.png")
            smv = (rng.rand(wh, wh, 3) * 255).astype(np.uint8)
            Image.fromarray(smv, "RGB").save(root / f"sm_{name}.png")
            frames.append(
                {"file_path": f"./{name}", "transform_matrix": m.tolist()}
            )
        meta = {
            "camera_angle_x": 0.6911,
            "light_camera_angle_x": 0.6911,
            "light_camera_transform_matrix": light_pose.tolist(),
            "resolution": 800,
            "frames": frames,
        }
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(root)
