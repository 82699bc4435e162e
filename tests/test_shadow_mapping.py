import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.models.camera import intrinsic_matrix, pose_from_blender_matrix
from nerf_pl_tpu.ops.shadow_mapping import (
    EPSILON,
    efficient_sm,
    gather_projected_depths,
    generate_shadow_map,
    get_normed_w,
    get_projections,
    normalize_min_max,
    project_pixels,
    run_shadow_mapping,
)


def naive_normed_w(M, pixel_depth):
    out = np.zeros_like(pixel_depth)
    for r in range(pixel_depth.shape[0]):
        p = pixel_depth[r, :3]
        coords = M @ p
        w = pixel_depth[r, 3] / (np.linalg.norm(coords) + EPSILON)
        out[r] = [*p, w]
    return out


def test_get_normed_w_matches_naive():
    rng = np.random.RandomState(0)
    M = intrinsic_matrix(60.0, (32, 32))
    pd = np.concatenate(
        [rng.rand(20, 2) * 32, np.ones((20, 1)), rng.rand(20, 1) * 10 + 1],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(get_normed_w(jnp.asarray(M), jnp.asarray(pd)))
    np.testing.assert_allclose(got, naive_normed_w(M, pd), rtol=1e-5)


def test_get_normed_w_per_ray_batched_matrices():
    rng = np.random.RandomState(1)
    M1 = intrinsic_matrix(60.0, (32, 32))
    M2 = intrinsic_matrix(30.0, (32, 32))
    pd = np.concatenate(
        [rng.rand(4, 2) * 32, np.ones((4, 1)), rng.rand(4, 1) * 5 + 1], axis=1
    ).astype(np.float32)
    Ms = np.stack([M1, M1, M2, M2])
    got = np.asarray(get_normed_w(jnp.asarray(Ms), jnp.asarray(pd)))
    want = np.concatenate(
        [naive_normed_w(M1, pd[:2]), naive_normed_w(M2, pd[2:])]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _posed_camera(key, hfov, res, eye, target):
    """Build a posed PPC via lookat."""
    from nerf_pl_tpu.models.camera import c2w_from_lookat

    M = intrinsic_matrix(hfov, res)
    c2w = c2w_from_lookat(
        np.asarray(eye, np.float32), np.asarray(target, np.float32)
    )
    cam, eye_pos = pose_from_blender_matrix(M, c2w[:3, :4])
    return cam, eye_pos


def test_projection_geometric_consistency():
    """A world point at camera pixel p with PPC depth w must project to its
    true light-space pixel: coords = ML^-1 (P - eyeL) = tL*[uL, vL, 1]."""
    res = (64, 64)
    cam_m, cam_eye = _posed_camera(0, 60.0, res, [0, 0, 5], [0, 0, 0])
    light_m, light_eye = _posed_camera(0, 60.0, res, [4, 4, 4], [0, 0, 0])

    rng = np.random.RandomState(2)
    pix = np.concatenate(
        [rng.rand(50, 2) * 48 + 8, np.ones((50, 1))], axis=1
    ).astype(np.float32)
    t = (rng.rand(50) * 2 + 2).astype(np.float32)  # PPC parameter along ray
    # world points P = eye + t * (M @ p)
    P = cam_eye + t[:, None] * (pix @ cam_m.T)

    ml_inv = np.linalg.inv(light_m)
    R = ml_inv @ cam_m
    Q = ml_inv @ (cam_eye - light_eye)
    K = np.asarray(
        project_pixels(jnp.asarray(pix), jnp.asarray(t), jnp.asarray(R),
                       jnp.asarray(Q))
    )
    want = (P - light_eye) @ ml_inv.T  # tL * [uL, vL, 1]
    np.testing.assert_allclose(K[:, 2], want[:, 2], rtol=1e-4)
    np.testing.assert_allclose(K[:, 0], want[:, 0] / want[:, 2], rtol=1e-3)
    np.testing.assert_allclose(K[:, 1], want[:, 1] / want[:, 2], rtol=1e-3)


def test_gather_projected_depths_clamps_and_indexes():
    w = h = 4
    w_light = jnp.arange(16, dtype=jnp.float32)
    K = jnp.asarray(
        [[-3.0, 1.2, 7.0], [2.4, 9.9, 3.0], [1.0, 2.0, 1.0]], jnp.float32
    )
    wl, bounded = gather_projected_depths((w, h), K, w_light)
    np.testing.assert_allclose(np.asarray(wl), [7.0, 3.0, 1.0])
    # row-major [vl, ul] with stride h: (1,0)->4 ; (3,2)->14 ; (2,1)->9
    np.testing.assert_allclose(np.asarray(bounded), [4.0, 14.0, 9.0])


def test_generate_shadow_map_methods():
    wl = jnp.asarray([1.0, 2.0, 3.0])
    w_light = jnp.asarray([1.5, 1.0, 1.0])
    sm1 = np.asarray(generate_shadow_map(wl, w_light, delta=1e-2, mode="shadow_method_1"))
    assert sm1.shape == (3, 3)
    np.testing.assert_allclose(sm1[0], 0.0)  # diff<0 clipped via max(eps)+clip
    np.testing.assert_allclose(sm1[1:], 1.0)  # large positive diff clipped at 1
    sm2 = np.asarray(generate_shadow_map(wl, w_light, mode="shadow_method_2"))
    diff = np.asarray(wl - w_light)
    want = (diff - diff.min()) / (diff.max() - diff.min() + EPSILON)
    np.testing.assert_allclose(sm2[:, 0], np.clip(want, 0, 1), rtol=1e-5)
    with pytest.raises(ValueError):
        generate_shadow_map(wl, w_light, mode="bogus")


def test_segment_normalization_matches_per_split():
    """method_2 with pose_idx == reference's per-pose-split normalization."""
    rng = np.random.RandomState(3)
    wl = rng.rand(20).astype(np.float32) * 3
    w_light = rng.rand(20).astype(np.float32)
    pose_idx = np.concatenate([np.zeros(12, np.int32), np.ones(8, np.int32)])
    got = np.asarray(
        generate_shadow_map(
            jnp.asarray(wl), jnp.asarray(w_light), mode="shadow_method_2",
            pose_idx=jnp.asarray(pose_idx), num_poses=2,
        )
    )
    for sl in (slice(0, 12), slice(12, 20)):
        want = np.asarray(
            generate_shadow_map(
                jnp.asarray(wl[sl]), jnp.asarray(w_light[sl]),
                mode="shadow_method_2",
            )
        )
        np.testing.assert_allclose(got[sl], want, rtol=1e-4, atol=1e-5)


def test_shadow_occluded_point_is_lit_up():
    """End-to-end sanity: a camera point BEHIND an occluder (as seen from the
    light) has wl > w_light at its light pixel -> shadow value > 0; an
    unoccluded point has wl == w_light -> ~0."""
    res = (64, 64)
    cam_m, cam_eye = _posed_camera(0, 60.0, res, [0, 0, 6], [0, 0, 0])
    light_m, light_eye = _posed_camera(0, 60.0, res, [0, 6, 0.01], [0, 0, 0])

    # light depth map: uniform depth 6 except a closer occluder everywhere in
    # a band of rows
    w, h = res
    pix_l = np.stack(
        [np.tile(np.arange(w), h) + 0.5,
         np.repeat(np.arange(h), w) + 0.5,
         np.ones(w * h)], axis=1
    ).astype(np.float32)
    light_range = np.full(w * h, 6.0, np.float32)

    # camera sees a point at the origin (center pixel, depth 6)
    center = np.asarray([[w / 2 + 0.5, h / 2 + 0.5, 1.0]], np.float32)
    cam_depth = np.asarray([6.0], np.float32)
    pd_cam = np.concatenate([center, cam_depth[:, None]], axis=1)
    pd_light = np.concatenate([pix_l, light_range[:, None]], axis=1)
    normed_light = get_normed_w(jnp.asarray(light_m), jnp.asarray(pd_light))

    sm_unoccluded = np.asarray(
        run_shadow_mapping(res, jnp.asarray(cam_m), jnp.asarray(cam_eye),
                           jnp.asarray(light_m), jnp.asarray(light_eye),
                           jnp.asarray(pd_cam), normed_light,
                           mode="shadow_method_1", delta=1e-2)
    )
    # now an occluder: light sees something much closer everywhere
    light_range_occ = np.full(w * h, 1.0, np.float32)
    pd_light_occ = np.concatenate([pix_l, light_range_occ[:, None]], axis=1)
    normed_light_occ = get_normed_w(jnp.asarray(light_m), jnp.asarray(pd_light_occ))
    sm_occluded = np.asarray(
        run_shadow_mapping(res, jnp.asarray(cam_m), jnp.asarray(cam_eye),
                           jnp.asarray(light_m), jnp.asarray(light_eye),
                           jnp.asarray(pd_cam), normed_light_occ,
                           mode="shadow_method_1", delta=1e-2)
    )
    assert sm_occluded[0, 0] > 0.9  # deep in shadow
    assert sm_unoccluded[0, 0] < 0.2  # roughly lit (quantization tolerance)


def test_efficient_sm_writes_keys_and_epsilon():
    rng = np.random.RandomState(4)
    res = (8, 8)
    n = 16
    cam_m, cam_eye = _posed_camera(0, 60.0, res, [0, 0, 5], [0, 0, 0])
    light_m, light_eye = _posed_camera(0, 60.0, res, [3, 3, 3], [0, 0, 0])
    cam_pixels = np.concatenate(
        [rng.rand(n, 2) * 8, np.ones((n, 1))], 1
    ).astype(np.float32)
    light_pixels = np.stack(
        [np.tile(np.arange(8), 8) + 0.5, np.repeat(np.arange(8), 8) + 0.5,
         np.ones(64)], 1
    ).astype(np.float32)
    cam_results = {
        "depth_coarse": jnp.asarray(rng.rand(n).astype(np.float32) * 5 + 1),
        "depth_fine": jnp.asarray(rng.rand(n).astype(np.float32) * 5 + 1),
    }
    light_results = {
        "depth_coarse": jnp.asarray(rng.rand(64).astype(np.float32) * 5 + 1),
        "depth_fine": jnp.asarray(rng.rand(64).astype(np.float32) * 5 + 1),
    }
    out = efficient_sm(
        jnp.asarray(cam_pixels), jnp.asarray(light_pixels), cam_results,
        light_results, jnp.asarray(cam_m), jnp.asarray(cam_eye),
        jnp.asarray(light_m), jnp.asarray(light_eye), res,
        fine_sampling=True, light_has_fine=True,
    )
    assert out["rgb_coarse"].shape == (n, 3)
    assert out["rgb_fine"].shape == (n, 3)
    assert float(out["rgb_coarse"].min()) >= EPSILON - 1e-8
    # sm_* prefix for the joint RGB+SM path
    out2 = efficient_sm(
        jnp.asarray(cam_pixels), jnp.asarray(light_pixels), cam_results,
        light_results, jnp.asarray(cam_m), jnp.asarray(cam_eye),
        jnp.asarray(light_m), jnp.asarray(light_eye), res,
        fine_sampling=True, light_has_fine=False, out_prefix="sm",
    )
    assert "sm_coarse" in out2 and "sm_fine" in out2


def test_efficient_sm_differentiable():
    """Gradients flow from the shadow map back to the camera depths."""
    res = (8, 8)
    n = 8
    rng = np.random.RandomState(5)
    cam_m, cam_eye = _posed_camera(0, 60.0, res, [0, 0, 5], [0, 0, 0])
    light_m, light_eye = _posed_camera(0, 60.0, res, [3, 3, 3], [0, 0, 0])
    cam_pixels = jnp.asarray(
        np.concatenate([rng.rand(n, 2) * 8, np.ones((n, 1))], 1), jnp.float32
    )
    light_pixels = jnp.asarray(
        np.stack([np.tile(np.arange(8), 8) + 0.5,
                  np.repeat(np.arange(8), 8) + 0.5, np.ones(64)], 1),
        jnp.float32,
    )
    light_depth = jnp.asarray(rng.rand(64).astype(np.float32) * 5 + 1)

    def loss(cam_depth):
        out = efficient_sm(
            cam_pixels, light_pixels, {"depth_coarse": cam_depth},
            {"depth_coarse": light_depth}, jnp.asarray(cam_m),
            jnp.asarray(cam_eye), jnp.asarray(light_m),
            jnp.asarray(light_eye), res, fine_sampling=False,
            light_has_fine=False,
        )
        return jnp.sum(out["rgb_coarse"] ** 2)

    g = jax.grad(loss)(jnp.asarray(rng.rand(n).astype(np.float32) * 5 + 1))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_projective_divide_guard_no_nan():
    """A projection crossing the light's image plane (wl == 0) must stay
    finite in forward AND gradient — the reference's raw divide NaNs here
    (measured on chip twice with the submit_sm2 recipe; see
    ops/shadow_mapping.py::project_pixels)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_pl_tpu.ops.shadow_mapping import (
        gather_projected_depths,
        generate_shadow_map,
        project_pixels,
    )

    pixels = jnp.asarray([[0.5, 0.5, 1.0], [3.0, 2.0, 1.0]], jnp.float32)
    R = jnp.eye(3)
    Q = jnp.asarray([0.0, 0.0, -1.0])
    light_depth = jnp.linspace(0.1, 1.0, 64)

    def loss(w_cam):
        K = project_pixels(pixels, w_cam, R, Q)
        wl, wlb = gather_projected_depths((8, 8), K, light_depth)
        sm = generate_shadow_map(wl, wlb, mode="shadow_method_2")
        return sm.sum()

    # w_cam[0] = 1.0 makes ray 0's wl = 1*1 + (-1) = 0 exactly
    w = jnp.asarray([1.0, 0.7])
    val, grad = jax.value_and_grad(loss)(w)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
