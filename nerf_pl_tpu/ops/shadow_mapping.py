"""Differentiable shadow mapping (the fork's core contribution).

Math contract (reference ``models/efficient_shadow_mapping.py`` — the
batched per-ray pipeline; ``models/shadow_mapping_utils.py`` is the dense
H×W variant of the same math):

  * ``get_normed_w`` (``efficient_shadow_mapping.py:47-62``): pixel rows
    ``[i, j, 1, depth]`` → ``w = depth / (||M @ [i,j,1]|| + 1e-5)``.
  * ``get_diff_projections`` (``:65-83``): with ``R = M_L^-1 M_cam``,
    ``Q = M_L^-1 (eye_cam - eye_L)`` (``models/camera.py:121-132``):
    ``[u,v,w_l] = w_cam * (R @ [i,j,1]) + Q``; ``ul = u/w_l, vl = v/w_l``.
  * ``get_projected_depths`` (``:85-100``): clamp (ul, vl) to the viewport
    and gather the light's normalized depth ``w_light[vl, ul]``.
  * ``generate_shadow_map`` (``:103-130``): ``diff = wl - w_light_bounded``;
    method_1: ``max(diff/delta, epsilon)`` (crisp); method_2: min-max
    normalize (+optional sigmoid, smooth; the reference notes NaN risk —
    the 1e-5 guard in ``normalize_min_max`` is kept).  Stack to 3 channels,
    clip [0,1].

TPU-first redesign: the reference splits each ray batch at camera-pose
changes and loops per segment (``models/rendering_shadows.py:385-430``)
because its ``run_shadow_mapping`` takes ONE camera.  Here every function is
batched over rays — per-ray camera matrices/eyes enter as ``(..., 3, 3)`` /
``(..., 3)`` einsum operands, so one fused vectorized pass handles a batch
with any mix of poses (no host loop, no dynamic shapes).  The depth gather
is a flat one-hot-free ``take`` on the (H·W,) light depth.  method_2's
min-max normalization is per pose-segment in the reference (it normalized
each split separately); we reproduce that with ``segment_min``/``segment_max``
over a per-ray ``pose_idx`` when given, else normalize over the whole batch
(identical when the batch has one pose — the reference's common case, since
its shadow loaders use ``shuffle=False``).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-5


def normalize_min_max(x, new_max=1.0, new_min=0.0, eps: float = EPSILON):
    return (x - x.min()) / (x.max() - x.min() + eps) * (new_max - new_min) + new_min


def get_normed_w(camera_m: jnp.ndarray, pixel_depth: jnp.ndarray) -> jnp.ndarray:
    """``(N, 4) [i, j, 1, depth]`` → ``(N, 4) [i, j, 1, w]``.

    ``camera_m``: (3,3) or (N,3,3) PPC matrix M = [a,b,c].
    """
    pix = pixel_depth[:, :3]
    coords = jnp.einsum("...kc,...c->...k", camera_m, pix)
    norm = jnp.linalg.norm(coords, axis=-1) + EPSILON
    normed = pixel_depth[:, 3] / norm
    return jnp.concatenate([pix, normed[:, None]], axis=1)


def project_pixels(
    pixels: jnp.ndarray,  # (N, 3) [i, j, 1]
    w_cam: jnp.ndarray,  # (N,)
    R: jnp.ndarray,  # (3,3) or (N,3,3)
    Q: jnp.ndarray,  # (3,) or (N,3)
) -> jnp.ndarray:
    """K = (ul, vl, wl): camera pixels re-projected into the light PPC.

    The perspective divide is epsilon-guarded (signed, 1e-8): the
    reference divides raw (``efficient_shadow_mapping.py:81-83``) and a
    predicted depth whose projection crosses the light's image plane
    (``wl ~ 0``) yields 0/0 = NaN in its forward — poisoning the whole
    run through the loss.  Measured twice on chip with the exact
    submit_sm2 recipe (NaN at epoch 126/200 and, reran, 56/200; gradient
    clipping does not help because the FORWARD NaNs — results.md).  The
    guard deviates from the reference only on that measure-zero set where
    the reference produces NaN (there is no finite value to disagree
    with); the guarded ``ul``/``vl`` then saturate at the viewport clamp
    in ``gather_projected_depths``, exactly where any |wl|-small
    projection already lands.  ``wl`` itself is returned unguarded — it
    feeds ``diff = wl - gathered`` linearly and is finite."""
    proj = jnp.einsum("...kc,...c->...k", R, pixels)
    coords = w_cam[:, None] * proj + Q
    ul, vl, wl = coords[:, 0], coords[:, 1], coords[:, 2]
    eps = jnp.asarray(1e-8, wl.dtype)
    wl_safe = jnp.where(wl >= 0, jnp.maximum(wl, eps), jnp.minimum(wl, -eps))
    ul = ul / wl_safe
    vl = vl / wl_safe
    return jnp.stack([ul, vl, wl], axis=1)


def gather_projected_depths(
    res: Tuple[int, int],
    K: jnp.ndarray,  # (N, 3)
    w_light: jnp.ndarray,  # (H*W,) normalized light depths
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp (ul, vl) to the viewport and gather the light depth under each
    projected camera pixel (flat ``take`` — TPU-friendly dynamic gather)."""
    w, h = res
    ul = jnp.clip(K[:, 0], 0.0, w - 1.0).astype(jnp.int32)
    vl = jnp.clip(K[:, 1], 0.0, h - 1.0).astype(jnp.int32)
    # reference indexes w_light.view(w, h)[vl, ul] (efficient_shadow_mapping
    # .py:98) — row-major with row stride h (square images in practice)
    flat = vl * h + ul
    return K[:, 2], jnp.take(w_light, flat, axis=0)


def generate_shadow_map(
    wl: jnp.ndarray,
    w_light_bounded: jnp.ndarray,
    delta: float = 1e-2,
    epsilon: float = 0.0,
    new_min: float = 0.0,
    new_max: float = 1.0,
    sigmoid: bool = False,
    mode: str = "shadow_method_1",
    pose_idx: Optional[jnp.ndarray] = None,
    num_poses: int = 0,
) -> jnp.ndarray:
    """(N,) depth differences → (N, 3) shadow intensities in [0, 1]."""
    diff = wl - w_light_bounded
    if mode == "shadow_method_1":
        diff = jnp.maximum(diff / delta, epsilon)
    elif mode == "shadow_method_2":
        if pose_idx is not None and num_poses > 1:
            mn = jax.ops.segment_min(diff, pose_idx, num_segments=num_poses)
            mx = jax.ops.segment_max(diff, pose_idx, num_segments=num_poses)
            lo, hi = mn[pose_idx], mx[pose_idx]
        else:
            lo, hi = diff.min(), diff.max()
        diff = (diff - lo) / (hi - lo + EPSILON) * (new_max - new_min) + new_min
        if sigmoid:
            diff = jax.nn.sigmoid(diff)
    else:
        raise ValueError(f"{mode} not found")
    sm = jnp.stack([diff, diff, diff], axis=1)
    return jnp.clip(sm, 0.0, 1.0)


def run_shadow_mapping(
    res: Tuple[int, int],
    cam_m: jnp.ndarray,  # (3,3) or (N,3,3)
    cam_eye: jnp.ndarray,  # (3,) or (N,3)
    light_m: jnp.ndarray,  # (3,3)
    light_eye: jnp.ndarray,  # (3,)
    pixel_depth_cam: jnp.ndarray,  # (N, 4) [i, j, 1, depth]
    normed_light: jnp.ndarray,  # (H*W, 4) from get_normed_w on the light
    mode: str = "shadow_method_1",
    delta: float = 1e-2,
    epsilon: float = 0.0,
    new_min: float = 0.0,
    new_max: float = 1.0,
    sigmoid: bool = False,
    pose_idx: Optional[jnp.ndarray] = None,
    num_poses: int = 0,
) -> jnp.ndarray:
    """Full differentiable pipeline for a ray batch (reference
    ``run_shadow_mapping``, ``efficient_shadow_mapping.py:19-44``) —
    vectorized over per-ray poses instead of pose-split loops."""
    normed_cam = get_normed_w(cam_m, pixel_depth_cam)
    ml_inv = jnp.linalg.inv(light_m)
    R = ml_inv @ cam_m  # broadcasts over (N,3,3)
    Q = jnp.einsum("kc,...c->...k", ml_inv, cam_eye - light_eye)
    K = project_pixels(normed_cam[:, :3], normed_cam[:, 3], R, Q)
    wl, w_light_bounded = gather_projected_depths(res, K, normed_light[:, 3])
    return generate_shadow_map(
        wl, w_light_bounded, delta=delta, epsilon=epsilon, new_min=new_min,
        new_max=new_max, sigmoid=sigmoid, mode=mode,
        pose_idx=pose_idx, num_poses=num_poses,
    )


def get_projections(
    cam_m, cam_eye, light_m, light_eye, pixel_depth_cam
) -> jnp.ndarray:
    """Reference ``get_projections`` (``efficient_shadow_mapping.py:13-17``):
    normed w then raw (ul, vl, wl) — used by the light-sampler trainer."""
    normed_cam = get_normed_w(cam_m, pixel_depth_cam)
    ml_inv = jnp.linalg.inv(light_m)
    R = ml_inv @ cam_m
    Q = jnp.einsum("kc,...c->...k", ml_inv, cam_eye - light_eye)
    return project_pixels(normed_cam[:, :3], normed_cam[:, 3], R, Q)


def efficient_sm(
    cam_pixels: jnp.ndarray,  # (N, 3) [i+.5, j+.5, 1]
    light_pixels: jnp.ndarray,  # (H*W, 3)
    cam_results: Dict[str, jnp.ndarray],  # from the sigma renderer
    light_results: Dict[str, jnp.ndarray],  # full light-view depth render
    cam_m: jnp.ndarray,  # (N,3,3) or (3,3) per-ray camera matrices
    cam_eye: jnp.ndarray,  # (N,3) or (3,)
    light_m: jnp.ndarray,  # (3,3)
    light_eye: jnp.ndarray,  # (3,)
    image_shape: Tuple[int, int],
    fine_sampling: bool,
    light_has_fine: bool,
    shadow_method: str = "shadow_method_2",
    pose_idx: Optional[jnp.ndarray] = None,
    num_poses: int = 0,
    out_prefix: str = "rgb",
) -> Dict[str, jnp.ndarray]:
    """Ray-batch shadow compositing (reference ``efficient_sm``,
    ``models/rendering_shadows.py:359-482``).

    Writes ``{out_prefix}_coarse`` / ``{out_prefix}_fine`` into
    ``cam_results`` (+ the reference's EPSILON offset).  The reference's
    shadow-only trainers write into ``rgb_*``; the joint RGB+SM renderer
    writes ``sm_*`` (``models/rendering_rgb_sm.py:458,477``) — select with
    ``out_prefix``.  NOTE the reference's image-space variant assigns the
    COARSE map to ``rgb_fine`` (bug, ``rendering_shadows.py:351``); here
    fine gets the fine map (documented fix, SURVEY.md §7).
    """
    kwargs = dict(
        mode=shadow_method, delta=1e-2, epsilon=0.0, new_min=0.0,
        new_max=1.0, sigmoid=False, pose_idx=pose_idx, num_poses=num_poses,
    )

    def sm_from(cam_depth, light_depth):
        pd_cam = jnp.concatenate([cam_pixels, cam_depth[:, None]], axis=1)
        pd_light = jnp.concatenate([light_pixels, light_depth[:, None]], axis=1)
        normed_light = get_normed_w(light_m, pd_light)
        return run_shadow_mapping(
            image_shape, cam_m, cam_eye, light_m, light_eye,
            pd_cam, normed_light, **kwargs,
        )

    sm_coarse = sm_from(cam_results["depth_coarse"], light_results["depth_coarse"])
    out = dict(cam_results)
    out[f"{out_prefix}_coarse"] = sm_coarse + EPSILON

    if fine_sampling:
        light_depth = (
            light_results["depth_fine"]
            if light_has_fine
            else light_results["depth_coarse"]
        )
        sm_fine = sm_from(cam_results["depth_fine"], light_depth)
        out[f"{out_prefix}_fine"] = sm_fine + EPSILON
    return out


def shadow_mapping_images(
    cam_results: Dict[str, jnp.ndarray],
    light_results: Dict[str, jnp.ndarray],
    cam_ms: jnp.ndarray,  # (B,3,3) one per image
    cam_eyes: jnp.ndarray,  # (B,3)
    light_m: jnp.ndarray,
    light_eye: jnp.ndarray,
    image_shape: Tuple[int, int],
    batch_size: int,
    fine_sampling: bool,
    shadow_method: str = "shadow_method_2",
) -> Dict[str, jnp.ndarray]:
    """Image-space shadow compositing (reference ``shadow_mapping``,
    ``models/rendering_shadows.py:283-353``): whole H×W depth images from
    both views, one camera pose per image; +0.5 pixel centers like the dense
    pipeline (``shadow_mapping_utils.py:56-57``).  Vectorized with vmap over
    the image batch."""
    w, h = image_shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pixels = jnp.stack(
        [xx.reshape(-1) + 0.5, yy.reshape(-1) + 0.5, jnp.ones(h * w)], axis=1
    ).astype(jnp.float32)

    def one(cam_m, cam_eye, cam_depth, light_depth):
        pd_cam = jnp.concatenate([pixels, cam_depth[:, None]], axis=1)
        pd_light = jnp.concatenate([pixels, light_depth[:, None]], axis=1)
        normed_light = get_normed_w(light_m, pd_light)
        return run_shadow_mapping(
            image_shape, cam_m, cam_eye, light_m, light_eye, pd_cam,
            normed_light, mode=shadow_method,
        )

    def composite_key(key):
        cam_d = cam_results[f"depth_{key}"].reshape(batch_size, h * w)
        light_d = light_results[f"depth_{key}"].reshape(batch_size, h * w)
        sm = jax.vmap(one)(cam_ms, cam_eyes, cam_d, light_d)
        return sm.reshape(-1, 3)

    out = dict(cam_results)
    out["rgb_coarse"] = composite_key("coarse")
    if fine_sampling:
        # reference bug NOT reproduced: fine gets the fine map
        # (rendering_shadows.py:351 assigns coarse)
        out["rgb_fine"] = composite_key("fine")
    return out
