"""Analytic synthetic-scene generator (framework self-test data).

Ray-traces a lambertian position-colored sphere over a checkered ground
plane with a hard point-light shadow, writing a full Blender-format scene
(RGBA frames + ``sm_*.png`` shadow maps + light camera metadata) that every
trainer in the framework can consume.  The reference has no equivalent —
it assumes external Blender renders; this generator makes end-to-end
convergence testable hermetically.
"""
from __future__ import annotations

import json
import os

import numpy as np

SPHERE_C = np.array([0.0, 0.2, 0.0], np.float32)
SPHERE_R = 1.0
GROUND_Y = -1.0
# finite ground DISC, not an infinite plane: horizon rays on an infinite
# plane hit geometry far outside any finite light frustum, whose clamped
# light-map gathers make those pixels' shadow targets unmatchable by the
# shadow-mapping pipeline (efficient_shadow_mapping.py:85-100 clamps).
# Keeping all geometry inside the light frustum makes shadow training on
# this scene well-posed end to end.
GROUND_R = 3.5
LIGHT_POS = np.array([4.5, 7.5, 3.0], np.float32)


def look_at(eye, target=np.zeros(3, np.float32)):
    fwd = eye - target
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross([0.0, 1.0, 0.0], fwd)
    right = right / np.linalg.norm(right)
    up = np.cross(fwd, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, fwd, eye
    return m


def ray_sphere(o, d):
    """t of first sphere hit, inf if miss. o, d: (N, 3)."""
    oc = o - SPHERE_C
    b = np.sum(oc * d, -1)
    c = np.sum(oc * oc, -1) - SPHERE_R**2
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where((disc > 0) & (t > 1e-3), t, np.inf)


def ray_ground(o, d):
    t = (GROUND_Y - o[:, 1]) / d[:, 1]
    valid = (np.abs(d[:, 1]) > 1e-6) & (t > 1e-3)
    p = o + np.where(valid, t, 0.0)[:, None] * d
    valid &= p[:, 0] ** 2 + p[:, 2] ** 2 <= GROUND_R**2
    return np.where(valid, t, np.inf)


def in_shadow(p):
    """Point -> is the segment to the light blocked by the sphere?"""
    to_l = LIGHT_POS - p
    dist = np.linalg.norm(to_l, axis=-1, keepdims=True)
    d = to_l / dist
    t = ray_sphere(p + 1e-3 * d, d)
    return t < dist[:, 0]


def shade(o, d):
    """Returns (rgb [N,3], alpha [N]) for rays; white background."""
    n = o.shape[0]
    t_s = ray_sphere(o, d)
    t_g = ray_ground(o, d)
    rgb = np.ones((n, 3), np.float32)
    alpha = np.zeros(n, np.float32)

    hit_s = t_s < t_g
    if hit_s.any():
        p = o[hit_s] + t_s[hit_s, None] * d[hit_s]
        nrm = (p - SPHERE_C) / SPHERE_R
        l = LIGHT_POS - p
        l = l / np.linalg.norm(l, axis=-1, keepdims=True)
        lam = np.clip(np.sum(nrm * l, -1), 0.1, 1.0)
        base = 0.5 + 0.5 * nrm  # position-colored
        rgb[hit_s] = base * lam[:, None]
        alpha[hit_s] = 1.0

    hit_g = (t_g < t_s) & np.isfinite(t_g)
    if hit_g.any():
        p = o[hit_g] + t_g[hit_g, None] * d[hit_g]
        checker = ((np.floor(p[:, 0]) + np.floor(p[:, 2])) % 2).astype(
            np.float32
        )
        base = 0.55 + 0.25 * checker[:, None] * np.ones((1, 3), np.float32)
        sh = in_shadow(p)
        base[sh] *= 0.25
        rgb[hit_g] = base
        alpha[hit_g] = 1.0
    return np.clip(rgb, 0, 1), alpha


def render_view(c2w, wh, focal):
    from nerf_pl_tpu.ops.ray_utils import get_ray_directions, get_rays

    dirs = get_ray_directions(wh, wh, focal)
    o, d = get_rays(dirs, c2w[:3, :4])
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rgb, alpha = shade(o, d)
    return rgb.reshape(wh, wh, 3), alpha.reshape(wh, wh)


def shadow_map_view(c2w, wh, focal):
    """GT shadow map: 1 where the first hit is shadowed, else 0 (3-ch)."""
    from nerf_pl_tpu.ops.ray_utils import get_ray_directions, get_rays

    dirs = get_ray_directions(wh, wh, focal)
    o, d = get_rays(dirs, c2w[:3, :4])
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    t_s = ray_sphere(o, d)
    t_g = ray_ground(o, d)
    t = np.minimum(t_s, t_g)
    sm = np.zeros(o.shape[0], np.float32)
    hit = np.isfinite(t)
    p = o[hit] + t[hit, None] * d[hit]
    sm[hit] = in_shadow(p).astype(np.float32)
    return np.stack([sm] * 3, -1).reshape(wh, wh, 3)




def generate_llff_scene(out_dir, img_wh=(64, 48), n_views=20,
                        distance=4.5, camera_angle_x=0.8,
                        spheric: bool = False):
    """Write the same analytic scene in LLFF layout (``images/*.png`` +
    ``poses_bounds.npy``): a forward-facing camera fan looking at the
    sphere from one side — the geometry ``data/llff.py`` expects
    (poses stored in COLMAP's "down right back" convention with an
    ``[H, W, focal]`` column and per-image depth bounds,
    reference ``datasets/llff.py:177-198``).  ``spheric=True`` places the
    cameras on a full inward-facing ring instead (train with
    ``--spheric_poses``: no NDC warp, near/far from the bounds)."""
    from PIL import Image

    from ..ops.ray_utils import get_ray_directions, get_rays

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    w, h = img_wh
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
    rows = []
    for i in range(n_views):
        if spheric:
            theta = 2 * np.pi * i / max(n_views, 1)
            eye = np.array(
                [distance * np.sin(theta),
                 1.0 + 0.5 * np.sin(2 * theta),
                 distance * np.cos(theta)],
                np.float32,
            )
        else:
            # lateral fan + small height jitter; all looking at the origin
            # (forward-facing => valid for the NDC ray warp)
            t = (i / max(n_views - 1, 1)) - 0.5
            eye = np.array(
                [2.4 * t, 0.4 + 0.5 * np.sin(4 * np.pi * t), distance],
                np.float32,
            )
        c2w = look_at(eye)
        dirs = get_ray_directions(h, w, focal)
        o, d = get_rays(dirs, c2w[:3, :4])
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        rgb, _ = shade(o, d)
        Image.fromarray(
            (rgb.reshape(h, w, 3) * 255).astype(np.uint8)
        ).save(os.path.join(out_dir, "images", f"{i:03d}.png"))
        # exact per-view depth bounds from the analytic tracer (COLMAP
        # derives these from the sparse points; a heuristic here once cut
        # `far` short of the scene for ring cameras and sank spheric val)
        t = np.minimum(ray_sphere(o, d), ray_ground(o, d))
        t = t[np.isfinite(t)]
        if len(t):
            near, far = 0.9 * float(t.min()), 1.1 * float(t.max())
        else:
            near, far = 1.0, 2.0 * float(np.linalg.norm(eye))
        # store columns [down, right, back, eye | hwf]
        down, right, back = -c2w[:3, 1], c2w[:3, 0], c2w[:3, 2]
        pose = np.stack([down, right, back, eye], 1)
        hwf = np.array([[h], [w], [focal]], np.float32)
        rows.append(
            np.concatenate(
                [np.concatenate([pose, hwf], 1).reshape(-1), [near, far]]
            )
        )
    np.save(os.path.join(out_dir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return out_dir


def generate_scene(out_dir, img_wh=64, n_train=20, n_val=2, n_test=2,
                   radius=4.5, camera_angle_x=0.8):
    """Write a complete scene; returns out_dir."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    wh = img_wh
    focal = 0.5 * 800 / np.tan(0.5 * camera_angle_x) * wh / 800
    light_c2w = look_at(LIGHT_POS)
    for split, n, off in [("train", n_train, 0.0), ("val", n_val, 0.33),
                          ("test", n_test, 0.66)]:
        frames = []
        for i in range(n):
            theta = 2 * np.pi * (i + off) / max(n, 1)
            height = 1.2 + 0.8 * np.sin(1.7 * theta)
            eye = np.array(
                [radius * np.sin(theta), height, radius * np.cos(theta)],
                np.float32,
            )
            c2w = look_at(eye)
            rgb, alpha = render_view(c2w, wh, focal)
            rgba = np.concatenate([rgb, alpha[..., None]], -1)
            name = f"r_{split}_{i}"
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(out_dir, f"{name}.png")
            )
            sm = shadow_map_view(c2w, wh, focal)
            Image.fromarray((sm * 255).astype(np.uint8), "RGB").save(
                os.path.join(out_dir, f"sm_{name}.png")
            )
            frames.append(
                {"file_path": f"./{name}", "transform_matrix": c2w.tolist()}
            )
        meta = {
            "camera_angle_x": camera_angle_x,
            "light_camera_angle_x": camera_angle_x,
            "light_camera_transform_matrix": light_c2w.tolist(),
            "resolution": 800,
            "frames": frames,
        }
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return out_dir


def generate_pyredner_scene(out_dir, img_wh=64, n_train=20, n_val=2,
                            n_test=2, radius=4.5, camera_angle_x=0.8):
    """PyRedner-format variant (reference ``datasets/pyredner2.py``): the
    same ray-traced scene, but each pose is stored as an explicit
    ``{'eye_pos', 'camera'}`` PPC dict (the loader re-derives the ray c2w by
    look-at toward ``meta['look_at']``, ``pyredner2.py:103-112``) and every
    frame carries its shadow map via ``sm_file_path``.  Exact by
    construction: the generator's ``look_at`` is the same math as
    ``camera.c2w_from_lookat``, so the loader's reconstructed c2w matches
    the c2w the images were rendered from."""
    from .shadow_common import posed_ppc

    generate_scene(out_dir, img_wh, n_train, n_val, n_test, radius,
                   camera_angle_x)
    wh = (img_wh, img_wh)
    for split in ("train", "val", "test"):
        path = os.path.join(out_dir, f"transforms_{split}.json")
        with open(path) as f:
            meta = json.load(f)
        frames = []
        for fr in meta["frames"]:
            c2w = np.asarray(fr["transform_matrix"], np.float32)[:3, :4]
            cam, eye = posed_ppc(meta["camera_angle_x"], wh, c2w)
            name = fr["file_path"].split("/")[-1]
            frames.append({
                "transform_matrix": {"eye_pos": eye.tolist(),
                                     "camera": cam.tolist()},
                "sm_file_path": f"sm_{name}.png",
            })
        l2w = np.asarray(
            meta["light_camera_transform_matrix"], np.float32
        )[:3, :4]
        lcam, leye = posed_ppc(meta["light_camera_angle_x"], wh, l2w)
        with open(path, "w") as f:
            json.dump({
                "camera_angle_x": meta["camera_angle_x"],
                "light_camera_angle_x": meta["light_camera_angle_x"],
                "light_camera_transform_matrix": {
                    "eye_pos": leye.tolist(), "camera": lcam.tolist(),
                },
                "look_at": [0.0, 0.0, 0.0],
                "frames": frames,
            }, f)
    return out_dir
