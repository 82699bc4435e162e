"""Shadow-mapping allclose parity against a torch-ops fixture.

Mirrors ``test_torch_parity.py`` for the shadow stack (BASELINE config 4):
the torch functions below re-state the reference pipeline semantics
(``models/efficient_shadow_mapping.py:47-131`` and
``models/camera.py:69-132``) on torch ops, and the framework's jax ops
must match outputs AND input gradients on identical inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerf_pl_tpu.models.camera import Camera, intrinsic_matrix
from nerf_pl_tpu.ops.shadow_mapping import (
    EPSILON,
    gather_projected_depths,
    generate_shadow_map,
    get_normed_w,
    project_pixels,
)

RES = (16, 16)
N = 64


def torch_normed_w(M, pixel_depth):
    # reference get_normed_w (efficient_shadow_mapping.py:47-62)
    pix = pixel_depth[:, :3]
    coords = torch.sum(pix[..., None, :] * M, -1)
    norm = torch.linalg.norm(coords, dim=1) + EPSILON
    return torch.cat([pix, (pixel_depth[:, 3] / norm).view(-1, 1)], dim=1)


def torch_projections(pixels, w_cam, R, Q):
    # reference get_diff_projections (efficient_shadow_mapping.py:65-83)
    proj = torch.sum(pixels[..., None, :] * R, -1)
    coords = torch.stack([w_cam] * 3, axis=1) * proj + Q
    ul, vl, wl = torch.unbind(coords, dim=1)
    return torch.stack([ul / wl, vl / wl, wl], axis=1)


def torch_projected_depths(res, K, w_light):
    # reference get_projected_depths (efficient_shadow_mapping.py:85-100)
    w, h = res
    ul = torch.clamp(K[:, 0], 0.0, w - 1.0)
    vl = torch.clamp(K[:, 1], 0.0, h - 1.0)
    return K[:, 2], w_light.view(w, h)[vl.long(), ul.long()]


def torch_shadow_map(wl, w_light_bounded, mode, delta=1e-2, epsilon=0.0,
                     sigmoid=False):
    # reference generate_shadow_map (efficient_shadow_mapping.py:103-131)
    diff = wl - w_light_bounded
    if mode == "shadow_method_1":
        diff = torch.max(diff / delta, torch.tensor(epsilon))
    else:
        diff = (diff - diff.min()) / (diff.max() - diff.min() + EPSILON)
        if sigmoid:
            diff = torch.sigmoid(diff)
    return torch.stack([diff] * 3, dim=1).clip(0.0, 1.0)


def _scene(seed=0):
    """Two PPCs from blender c2w poses + random pixel/depth tensors."""
    rng = np.random.RandomState(seed)

    def pose(theta, height, r):
        eye = np.array([r * np.sin(theta), height, r * np.cos(theta)], np.float32)
        fwd = eye / np.linalg.norm(eye)
        right = np.cross([0, 1, 0], fwd).astype(np.float32)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        return np.stack([right, up, fwd, eye], 1).astype(np.float32)

    cam = Camera(camera=intrinsic_matrix(0.8, RES))
    cam.set_pose_using_blender_matrix(pose(0.3, 0.5, 4.0))
    light = Camera(camera=intrinsic_matrix(0.8, RES))
    light.set_pose_using_blender_matrix(pose(1.2, 3.0, 5.0))

    w, h = RES
    pixels = np.concatenate(
        [rng.rand(N, 2).astype(np.float32) * (w - 1), np.ones((N, 1), np.float32)], 1
    )
    depths = (rng.rand(N).astype(np.float32) * 3 + 2)
    light_depth = (rng.rand(w * h).astype(np.float32) * 0.5 + 0.2)
    return cam, light, pixels, depths, light_depth


def _pipelines(mode):
    cam, light, pixels, depths, light_depth = _scene()
    R, Q = cam.get_transformation_to(light)

    def jax_pipe(depths_, light_depth_):
        pd = jnp.concatenate([jnp.asarray(pixels), depths_[:, None]], axis=1)
        nw = get_normed_w(jnp.asarray(cam.camera), pd)
        K = project_pixels(nw[:, :3], nw[:, 3], jnp.asarray(R), jnp.asarray(Q))
        wl, wlb = gather_projected_depths(RES, K, light_depth_)
        return generate_shadow_map(wl, wlb, mode=mode)

    def torch_pipe(depths_, light_depth_):
        pd = torch.cat([torch.from_numpy(pixels), depths_[:, None]], dim=1)
        nw = torch_normed_w(torch.from_numpy(np.asarray(cam.camera, np.float32)), pd)
        K = torch_projections(
            nw[:, :3], nw[:, 3],
            torch.from_numpy(np.asarray(R, np.float32)),
            torch.from_numpy(np.asarray(Q, np.float32)),
        )
        wl, wlb = torch_projected_depths(RES, K, light_depth_)
        return torch_shadow_map(wl, wlb, mode=mode)

    return jax_pipe, torch_pipe, depths, light_depth


def test_shadow_pipeline_outputs_allclose():
    for mode in ("shadow_method_1", "shadow_method_2"):
        jax_pipe, torch_pipe, depths, light_depth = _pipelines(mode)
        got = np.asarray(jax_pipe(jnp.asarray(depths), jnp.asarray(light_depth)))
        ref = torch_pipe(torch.from_numpy(depths), torch.from_numpy(light_depth))
        np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_shadow_pipeline_input_gradients_allclose():
    for mode in ("shadow_method_1", "shadow_method_2"):
        jax_pipe, torch_pipe, depths, light_depth = _pipelines(mode)

        # d(sum(sm))/d(camera depths) and /d(light depth map)
        g_jax = jax.grad(
            lambda d, l: jnp.sum(jax_pipe(d, l)), argnums=(0, 1)
        )(jnp.asarray(depths), jnp.asarray(light_depth))

        d_t = torch.from_numpy(depths).requires_grad_(True)
        l_t = torch.from_numpy(light_depth).requires_grad_(True)
        torch_pipe(d_t, l_t).sum().backward()

        np.testing.assert_allclose(
            np.asarray(g_jax[0]), d_t.grad.numpy(), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_jax[1]), l_t.grad.numpy(), rtol=1e-3, atol=1e-5
        )
        if mode == "shadow_method_2":
            # the gather must route real gradient into the light depth map
            # (method_1 saturates its clip at these magnitudes — zero grad
            # in BOTH frameworks, which the allclose above already pins)
            assert float(np.abs(np.asarray(g_jax[1])).sum()) > 0
