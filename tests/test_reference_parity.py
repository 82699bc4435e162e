"""Allclose parity against the ACTUAL reference implementation.

Unlike ``test_torch_parity*.py`` (hand-written torch fixtures), every torch
side here is the reference's own code imported from /root/reference via
``reference_harness`` — identical weights are loaded into both sides and every
random draw the reference makes is intercepted and injected into our renderer
too, so outputs AND gradients must match to float32 tolerance.

Covered reference modules (VERDICT.md round-1 item #1):
  models/nerf.py, models/camera.py, models/efficient_shadow_mapping.py,
  models/shadow_mapping_utils.py, models/rendering.py,
  models/rendering_shadows.py, models/rendering_rgb_sm.py, losses.py,
  metrics.py (psnr/mse), datasets/ray_utils.py, utils/__init__.py factories,
  utils/optimizers.py (RAdam/Ranger), utils/warmup_scheduler.py.

Known documented divergences asserted here rather than papered over:
  * ``sample_pdf``'s ``det`` is honored by us (reference ignores it,
    models/rendering.py:51-55) — parity tests run the stochastic path with
    injected u/jitter, where both sides agree.
  * image-space ``shadow_mapping`` fine output: the reference assigns the
    COARSE map (models/rendering_shadows.py:351); we assign the fine map.
    The dense shadow math itself is parity-tested via
    ``shadow_mapping_utils.run_shadow_mapping``.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import (
    InjectRandom,
    load_reference,
    params_to_ref_nerf,
    ref_nerf_param_grads,
)

from nerf_pl_tpu.models import camera as our_camera
from nerf_pl_tpu.models.embedding import posenc
from nerf_pl_tpu.models.nerf import init_nerf, nerf_apply
from nerf_pl_tpu.ops import shadow_mapping as our_sm
from nerf_pl_tpu.ops.rendering import render_rays
from nerf_pl_tpu.training import losses as our_losses
from nerf_pl_tpu.training import metrics as our_metrics
from nerf_pl_tpu.training.optim import get_optimizer, make_lr_schedule


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def t(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


# ---------------------------------------------------------------------------
# L1 primitives: Embedding + NeRF MLP
# ---------------------------------------------------------------------------
def test_embedding_matches_reference(ref):
    x = np.random.RandomState(0).randn(17, 3).astype(np.float32) * 2.0
    for n_freqs in (10, 4):
        emb = ref.nerf.Embedding(3, n_freqs)
        want = emb(t(x)).numpy()
        got = np.asarray(posenc(jnp.asarray(x), n_freqs))
        assert got.shape == (17, 3 * (2 * n_freqs + 1))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # linear-scale branch (models/nerf.py:19)
    emb = ref.nerf.Embedding(3, 6, logscale=False)
    np.testing.assert_allclose(
        np.asarray(posenc(jnp.asarray(x), 6, logscale=False)),
        emb(t(x)).numpy(), rtol=1e-6, atol=1e-6,
    )


def test_nerf_mlp_forward_matches_reference(ref):
    params = init_nerf(jax.random.PRNGKey(1))  # full D8/W256
    model = params_to_ref_nerf(params, ref.nerf.NeRF)
    x = np.random.RandomState(1).randn(32, 90).astype(np.float32)
    with torch.no_grad():
        want = model(t(x)).numpy()
        want_sigma = model(t(x[:, :63]), sigma_only=True).numpy()
    got = np.asarray(nerf_apply(params, jnp.asarray(x)))
    got_sigma = np.asarray(
        nerf_apply(params, jnp.asarray(x[:, :63]), sigma_only=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_sigma, want_sigma, rtol=1e-5, atol=1e-5)


def test_nerf_mlp_param_grads_match_reference(ref):
    params = init_nerf(jax.random.PRNGKey(2), D=6, W=32)
    model = params_to_ref_nerf(params, ref.nerf.NeRF, requires_grad=True)
    x = np.random.RandomState(2).randn(48, 90).astype(np.float32)
    tgt = np.random.RandomState(3).rand(48, 4).astype(np.float32)

    out = model(t(x))
    ((out - t(tgt)) ** 2).mean().backward()
    want = ref_nerf_param_grads(model)

    got = jax.grad(
        lambda p: jnp.mean((nerf_apply(p, jnp.asarray(x)) - jnp.asarray(tgt)) ** 2)
    )(params)

    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        denom = max(np.abs(w).max(), 1e-8)
        assert np.abs(np.asarray(g) - w).max() / denom < 1e-4


# ---------------------------------------------------------------------------
# ray generation (datasets/ray_utils.py)
# ---------------------------------------------------------------------------
def test_ray_utils_match_reference(ref):
    from nerf_pl_tpu.ops import ray_utils as ours

    H, W, focal = 6, 9, 11.0
    dirs_ref = ref.ray_utils.get_ray_directions(H, W, focal).numpy()
    dirs = np.asarray(ours.get_ray_directions(H, W, focal))
    np.testing.assert_allclose(dirs, dirs_ref, rtol=1e-6, atol=1e-6)

    c2w = ref.camera.Camera.c2w_from_lookat(
        np.array([2.0, 1.5, 3.0], np.float32), np.zeros(3, np.float32)
    )[:3, :4]
    o_ref, d_ref = ref.ray_utils.get_rays(t(dirs_ref), t(c2w))
    o, d = ours.get_rays(jnp.asarray(dirs), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o), o_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-5, atol=1e-6)

    no_ref, nd_ref = ref.ray_utils.get_ndc_rays(H, W, focal, 1.0, o_ref, d_ref)
    no, nd = ours.get_ndc_rays(H, W, focal, 1.0, o, d)
    np.testing.assert_allclose(np.asarray(no), no_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nd), nd_ref.numpy(), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# renderers: identical weights + injected randomness
# ---------------------------------------------------------------------------
def _setup_render(seed, n=20, ns=12, ni=7):
    kc, kf = jax.random.split(jax.random.PRNGKey(seed))
    pc, pf = init_nerf(kc, D=8, W=32), init_nerf(kf, D=8, W=32)
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 0.2
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], 1
    )
    draws = {
        "perturb_rand": rng.rand(n, ns).astype(np.float32),
        "noise_coarse": rng.randn(n, ns).astype(np.float32),
        "u": rng.rand(n, ni).astype(np.float32),
        "jitter": rng.rand(n, ni).astype(np.float32),
        "noise_fine": rng.randn(n, ns + ni).astype(np.float32),
    }
    return pc, pf, rays, draws, ns, ni


def _ref_models(ref, pc, pf, requires_grad=False):
    mc = params_to_ref_nerf(pc, ref.nerf.NeRF, requires_grad)
    mf = params_to_ref_nerf(pf, ref.nerf.NeRF, requires_grad)
    embeddings = [ref.nerf.Embedding(3, 10), ref.nerf.Embedding(3, 4)]
    return [mc, mf], embeddings


# reference draw order with perturb>0, noise_std>0, N_importance>0
# (models/rendering.py:231,178 [coarse], :39,:44 [sample_pdf], :178 [fine])
def _queue(draws):
    return [
        ("rand", draws["perturb_rand"]),
        ("randn", draws["noise_coarse"]),
        ("rand", draws["u"]),
        ("rand_like", draws["jitter"]),
        ("randn", draws["noise_fine"]),
    ]


def _ours_overrides(draws):
    return {k: jnp.asarray(v) for k, v in draws.items()}


def test_render_rays_rgb_matches_reference(ref):
    pc, pf, rays, draws, ns, ni = _setup_render(10)
    models, embeddings = _ref_models(ref, pc, pf)
    with torch.no_grad(), InjectRandom(_queue(draws)):
        want = ref.rendering.render_rays(
            models, embeddings, t(rays), N_samples=ns, perturb=1.0,
            noise_std=1.0, N_importance=ni, white_back=True,
        )
    got = render_rays(
        pc, pf, jnp.asarray(rays), None, N_samples=ns, N_importance=ni,
        perturb=1.0, noise_std=1.0, white_back=True, mode="rgb",
        overrides=_ours_overrides(draws),
    )
    for k in ("rgb_coarse", "depth_coarse", "opacity_coarse",
              "rgb_fine", "depth_fine", "opacity_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_render_rays_rgb_grads_match_reference(ref):
    pc, pf, rays, draws, ns, ni = _setup_render(11)
    models, embeddings = _ref_models(ref, pc, pf, requires_grad=True)
    target = np.random.RandomState(7).rand(rays.shape[0], 3).astype(np.float32)

    with InjectRandom(_queue(draws)):
        res = ref.rendering.render_rays(
            models, embeddings, t(rays), N_samples=ns, perturb=1.0,
            noise_std=1.0, N_importance=ni, white_back=True,
        )
    loss = ((res["rgb_coarse"] - t(target)) ** 2).mean() + (
        (res["rgb_fine"] - t(target)) ** 2
    ).mean()
    loss.backward()
    want = {"c": ref_nerf_param_grads(models[0]),
            "f": ref_nerf_param_grads(models[1])}

    def jax_loss(p):
        r = render_rays(
            p["c"], p["f"], jnp.asarray(rays), None, N_samples=ns,
            N_importance=ni, perturb=1.0, noise_std=1.0, white_back=True,
            mode="rgb", overrides=_ours_overrides(draws),
        )
        tt = jnp.asarray(target)
        return jnp.mean((r["rgb_coarse"] - tt) ** 2) + jnp.mean(
            (r["rgb_fine"] - tt) ** 2
        )

    got = jax.grad(jax_loss)({"c": pc, "f": pf})
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        denom = max(np.abs(w).max(), 1e-8)
        assert np.abs(np.asarray(g) - w).max() / denom < 1e-3


def test_render_rays_rgb_test_time_matches_reference(ref):
    pc, pf, rays, draws, ns, ni = _setup_render(12)
    models, embeddings = _ref_models(ref, pc, pf)
    queue = _queue(draws)[1:]  # perturb=0: no perturb draw
    with torch.no_grad(), InjectRandom(queue):
        want = ref.rendering.render_rays(
            models, embeddings, t(rays), N_samples=ns, perturb=0.0,
            noise_std=1.0, N_importance=ni, white_back=False, test_time=True,
        )
    got = render_rays(
        pc, pf, jnp.asarray(rays), None, N_samples=ns, N_importance=ni,
        perturb=0.0, noise_std=1.0, white_back=False, test_time=True,
        mode="rgb", overrides=_ours_overrides(draws),
    )
    assert "rgb_coarse" not in got and "rgb_coarse" not in want
    for k in ("opacity_coarse", "rgb_fine", "depth_fine", "opacity_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_render_rays_sigma_matches_reference(ref):
    """models/rendering_shadows.py render_rays: sigma-only + disp keys; its
    sample_pdf uses stock torch.searchsorted (:41) — same contract."""
    pc, pf, rays, draws, ns, ni = _setup_render(13)
    models, embeddings = _ref_models(ref, pc, pf)
    with torch.no_grad(), InjectRandom(_queue(draws)):
        want = ref.rendering_shadows.render_rays(
            models, embeddings, t(rays), N_samples=ns, perturb=1.0,
            noise_std=1.0, N_importance=ni,
        )
    got = render_rays(
        pc, pf, jnp.asarray(rays), None, N_samples=ns, N_importance=ni,
        perturb=1.0, noise_std=1.0, mode="sigma",
        overrides=_ours_overrides(draws),
    )
    for k in ("depth_coarse", "opacity_coarse", "disp_map_coarse",
              "depth_fine", "opacity_fine", "disp_map_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_render_rays_sigma_grads_match_reference(ref):
    pc, pf, rays, draws, ns, ni = _setup_render(14)
    models, embeddings = _ref_models(ref, pc, pf, requires_grad=True)
    target = np.random.RandomState(8).rand(rays.shape[0]).astype(np.float32) * 4

    with InjectRandom(_queue(draws)):
        res = ref.rendering_shadows.render_rays(
            models, embeddings, t(rays), N_samples=ns, perturb=1.0,
            noise_std=1.0, N_importance=ni,
        )
    loss = ((res["depth_coarse"] - t(target)) ** 2).mean() + (
        (res["depth_fine"] - t(target)) ** 2
    ).mean()
    loss.backward()
    want = {"c": ref_nerf_param_grads(models[0]),
            "f": ref_nerf_param_grads(models[1])}
    # rgb/dir-head leaves get no grads through the sigma-only path: drop them
    for side in want.values():
        for head in ("rgb", "dir_layer", "xyz_final"):
            side.pop(head)

    def jax_loss(p):
        r = render_rays(
            p["c"], p["f"], jnp.asarray(rays), None, N_samples=ns,
            N_importance=ni, perturb=1.0, noise_std=1.0, mode="sigma",
            overrides=_ours_overrides(draws),
        )
        tt = jnp.asarray(target)
        return jnp.mean((r["depth_coarse"] - tt) ** 2) + jnp.mean(
            (r["depth_fine"] - tt) ** 2
        )

    got = jax.grad(jax_loss)({"c": pc, "f": pf})
    for side in got.values():
        for head in ("rgb", "dir_layer", "xyz_final"):
            side.pop(head)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        denom = max(np.abs(w).max(), 1e-8)
        assert np.abs(np.asarray(g) - w).max() / denom < 1e-3


def test_render_rays_rgb_disp_matches_reference(ref):
    """models/rendering_rgb_sm.py render_rays: rgb + disp_map keys."""
    pc, pf, rays, draws, ns, ni = _setup_render(15)
    models, embeddings = _ref_models(ref, pc, pf)
    with torch.no_grad(), InjectRandom(_queue(draws)):
        want = ref.rendering_rgb_sm.render_rays(
            models, embeddings, t(rays), N_samples=ns, perturb=1.0,
            noise_std=1.0, N_importance=ni, white_back=True,
        )
    got = render_rays(
        pc, pf, jnp.asarray(rays), None, N_samples=ns, N_importance=ni,
        perturb=1.0, noise_std=1.0, white_back=True, mode="rgb_disp",
        overrides=_ours_overrides(draws),
    )
    for k in ("rgb_coarse", "depth_coarse", "opacity_coarse",
              "disp_map_coarse", "rgb_fine", "depth_fine", "opacity_fine",
              "disp_map_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


# ---------------------------------------------------------------------------
# camera + shadow-mapping geometry
# ---------------------------------------------------------------------------
def _make_pose(ref, eye, res=(8, 8), hfov=40.0):
    cam = ref.camera.Camera(hfov, res)
    c2w = ref.camera.Camera.c2w_from_lookat(
        np.asarray(eye, np.float32).copy(), np.zeros(3, np.float32)
    )
    cam.set_pose_using_blender_matrix(t(c2w[:3, :4]))
    return cam


def test_camera_matches_reference(ref):
    res, hfov = (16, 12), 35.0
    ref_cam = ref.camera.Camera(hfov, res)
    np.testing.assert_allclose(
        our_camera.intrinsic_matrix(hfov, res), ref_cam.camera.numpy(),
        rtol=1e-6, atol=1e-6,
    )
    eye = np.array([3.0, 2.0, 4.0], np.float32)
    c2w_ref = ref.camera.Camera.c2w_from_lookat(eye.copy(), np.zeros(3, np.float32))
    c2w = our_camera.c2w_from_lookat(eye, np.zeros(3, np.float32))
    np.testing.assert_allclose(c2w, c2w_ref, rtol=1e-6, atol=1e-6)

    ref_cam.set_pose_using_blender_matrix(t(c2w_ref[:3, :4]))
    cam = our_camera.Camera.create(hfov, res)
    cam.set_pose_using_blender_matrix(c2w[:3, :4])
    np.testing.assert_allclose(cam.camera, ref_cam.camera.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cam.eye_pos, ref_cam.eye_pos.numpy(),
                               rtol=1e-6, atol=1e-6)

    light_ref = _make_pose(ref, [0.0, 5.0, 1.0], res, hfov)
    R_ref, Q_ref = ref_cam.get_transformation_to(light_ref)
    R, Q = our_camera.transformation_between(
        cam.camera, cam.eye_pos, light_ref.camera.numpy(),
        light_ref.eye_pos.numpy(),
    )
    np.testing.assert_allclose(R, R_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Q, Q_ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def sm_scene(ref):
    """A 3-pose ray batch + light view for shadow-map parity tests."""
    res = (8, 8)
    rng = np.random.RandomState(42)
    cams = [_make_pose(ref, e, res) for e in
            ([4.0, 1.0, 3.0], [-3.0, 2.0, 4.0], [1.0, 4.0, -4.0])]
    light = _make_pose(ref, [0.5, 6.0, 0.5], res)
    runs = [15, 15, 10]
    pose_idx = np.repeat(np.arange(3), runs)
    n = pose_idx.size
    iu = rng.randint(0, res[0], size=n).astype(np.float32) + 0.5
    jv = rng.randint(0, res[1], size=n).astype(np.float32) + 0.5
    cam_pixels = np.stack([iu, jv, np.ones(n, np.float32)], axis=1)
    yy, xx = np.meshgrid(np.arange(res[1]), np.arange(res[0]), indexing="ij")
    light_pixels = np.stack(
        [xx.reshape(-1) + 0.5, yy.reshape(-1) + 0.5, np.ones(res[0] * res[1])],
        axis=1,
    ).astype(np.float32)
    depths = {
        "cam_coarse": (rng.rand(n).astype(np.float32) * 3 + 3),
        "cam_fine": (rng.rand(n).astype(np.float32) * 3 + 3),
        "light_coarse": (rng.rand(res[0] * res[1]).astype(np.float32) * 3 + 3),
        "light_fine": (rng.rand(res[0] * res[1]).astype(np.float32) * 3 + 3),
    }
    cam_ms = np.stack([c.camera.numpy() for c in cams])[pose_idx]
    cam_eyes = np.stack([c.eye_pos.numpy() for c in cams])[pose_idx]
    return dict(res=res, cams=cams, light=light, pose_idx=pose_idx,
                cam_pixels=cam_pixels, light_pixels=light_pixels,
                depths=depths, cam_ms=cam_ms, cam_eyes=cam_eyes, n=n)


@pytest.mark.parametrize("method", ["shadow_method_1", "shadow_method_2"])
def test_efficient_sm_matches_reference(ref, sm_scene, method):
    s = sm_scene
    ppc = {
        "eye_pos": [t(e) for e in s["cam_eyes"]],
        "camera": [t(m) for m in s["cam_ms"]],
    }
    cam_results_ref = {"depth_coarse": t(s["depths"]["cam_coarse"]),
                       "depth_fine": t(s["depths"]["cam_fine"])}
    light_results_ref = {"depth_coarse": t(s["depths"]["light_coarse"]),
                         "depth_fine": t(s["depths"]["light_fine"])}
    with torch.no_grad():
        want = ref.rendering_shadows.efficient_sm(
            t(s["cam_pixels"]), t(s["light_pixels"]), dict(cam_results_ref),
            light_results_ref, ppc, s["light"], s["res"],
            fine_sampling=True, Light_N_importance=8, shadow_method=method,
        )
    got = our_sm.efficient_sm(
        jnp.asarray(s["cam_pixels"]), jnp.asarray(s["light_pixels"]),
        {"depth_coarse": jnp.asarray(s["depths"]["cam_coarse"]),
         "depth_fine": jnp.asarray(s["depths"]["cam_fine"])},
        {"depth_coarse": jnp.asarray(s["depths"]["light_coarse"]),
         "depth_fine": jnp.asarray(s["depths"]["light_fine"])},
        jnp.asarray(s["cam_ms"]), jnp.asarray(s["cam_eyes"]),
        jnp.asarray(s["light"].camera.numpy()),
        jnp.asarray(s["light"].eye_pos.numpy()),
        s["res"], fine_sampling=True, light_has_fine=True,
        shadow_method=method, pose_idx=jnp.asarray(s["pose_idx"]),
        num_poses=3,
    )
    for k in ("rgb_coarse", "rgb_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"{method}/{k}",
        )


def test_efficient_sm_stale_light_matches_reference(ref, sm_scene):
    """Light_N_importance=0: the fine pass reuses the COARSE light depths
    (models/rendering_shadows.py:476)."""
    s = sm_scene
    ppc = {"eye_pos": [t(e) for e in s["cam_eyes"]],
           "camera": [t(m) for m in s["cam_ms"]]}
    with torch.no_grad():
        want = ref.rendering_shadows.efficient_sm(
            t(s["cam_pixels"]), t(s["light_pixels"]),
            {"depth_coarse": t(s["depths"]["cam_coarse"]),
             "depth_fine": t(s["depths"]["cam_fine"])},
            {"depth_coarse": t(s["depths"]["light_coarse"])},
            ppc, s["light"], s["res"], fine_sampling=True,
            Light_N_importance=0, shadow_method="shadow_method_1",
        )
    got = our_sm.efficient_sm(
        jnp.asarray(s["cam_pixels"]), jnp.asarray(s["light_pixels"]),
        {"depth_coarse": jnp.asarray(s["depths"]["cam_coarse"]),
         "depth_fine": jnp.asarray(s["depths"]["cam_fine"])},
        {"depth_coarse": jnp.asarray(s["depths"]["light_coarse"])},
        jnp.asarray(s["cam_ms"]), jnp.asarray(s["cam_eyes"]),
        jnp.asarray(s["light"].camera.numpy()),
        jnp.asarray(s["light"].eye_pos.numpy()),
        s["res"], fine_sampling=True, light_has_fine=False,
        shadow_method="shadow_method_1",
        pose_idx=jnp.asarray(s["pose_idx"]), num_poses=3,
    )
    for k in ("rgb_coarse", "rgb_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_get_k_matches_reference(ref, sm_scene):
    s = sm_scene
    ppc = {"eye_pos": [t(e) for e in s["cam_eyes"]],
           "camera": [t(m) for m in s["cam_ms"]]}
    with torch.no_grad():
        want_c, want_f = ref.rendering_shadows.get_K(
            t(s["cam_pixels"]),
            {"depth_coarse": t(s["depths"]["cam_coarse"]),
             "depth_fine": t(s["depths"]["cam_fine"])},
            ppc, s["light"], fine_sampling=True,
        )
    light_m = jnp.asarray(s["light"].camera.numpy())
    light_eye = jnp.asarray(s["light"].eye_pos.numpy())

    def ours(depth):
        pd = jnp.concatenate(
            [jnp.asarray(s["cam_pixels"]), jnp.asarray(depth)[:, None]], axis=1
        )
        return our_sm.get_projections(
            jnp.asarray(s["cam_ms"]), jnp.asarray(s["cam_eyes"]),
            light_m, light_eye, pd,
        )

    np.testing.assert_allclose(
        np.asarray(ours(s["depths"]["cam_coarse"])), want_c.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours(s["depths"]["cam_fine"])), want_f.numpy(),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("method", ["shadow_method_1", "shadow_method_2"])
def test_dense_shadow_mapping_matches_reference(ref, sm_scene, method):
    """The dense H×W pipeline (models/shadow_mapping_utils.py) against our
    vectorized per-image path (ops.shadow_mapping building the +0.5 grid).

    Note the reference's image-space composite wrapper passes raw depth
    IMAGES where ``eff_sm.run_shadow_mapping`` expects (N,4) pixel rows
    (models/rendering_shadows.py:308-314) — that wrapper is driven at the
    trainer level instead; the underlying dense math is what's asserted here.
    """
    s = sm_scene
    res = s["res"]
    w, h = res
    cam = s["cams"][0]
    cam_depth = np.random.RandomState(5).rand(w, h).astype(np.float32) * 3 + 3
    light_depth = (
        np.random.RandomState(6).rand(w, h).astype(np.float32) * 3 + 3
    )
    with torch.no_grad():
        want = ref.sm_utils.run_shadow_mapping(
            res, cam, s["light"], t(cam_depth), t(light_depth), "cpu",
            mode=method,
        ).numpy()  # (w, h, 3)

    # our dense path: +0.5-centered pixel rows, flat row-major (stride h)
    pd_cam = jnp.concatenate(
        [jnp.asarray(s["light_pixels"]), jnp.asarray(cam_depth.reshape(-1))[:, None]],
        axis=1,
    )
    pd_light = jnp.concatenate(
        [jnp.asarray(s["light_pixels"]), jnp.asarray(light_depth.reshape(-1))[:, None]],
        axis=1,
    )
    normed_light = our_sm.get_normed_w(
        jnp.asarray(s["light"].camera.numpy()), pd_light
    )
    got = our_sm.run_shadow_mapping(
        res, jnp.asarray(cam.camera.numpy()), jnp.asarray(cam.eye_pos.numpy()),
        jnp.asarray(s["light"].camera.numpy()),
        jnp.asarray(s["light"].eye_pos.numpy()),
        pd_cam, normed_light, mode=method,
    )
    # the dense reference variant skips eff_sm's +EPSILON norm guard and
    # min-max eps; both are 1e-5-scale -> absorbed by the tolerance
    np.testing.assert_allclose(
        np.asarray(got).reshape(w, h, 3), want, rtol=5e-4, atol=5e-4,
    )


def test_sm_pixel_grid_matches_reference(ref, sm_scene):
    """Our flat light-pixel buffer equals the reference's dense meshgrid
    ordering (the [q+.5, p+.5, 1]-at-[p,q] convention), so the flat gather
    ``vl*h + ul`` indexes the same entries as ``w_light.view(w,h)[vl,ul]``."""
    s = sm_scene
    w, h = s["res"]
    pv = np.arange(h)
    pu = np.arange(w)
    i, j = np.meshgrid(pv, pu, indexing="xy")
    ref_pixels = np.stack(
        [i + 0.5, j + 0.5, np.ones_like(i, np.float32)], axis=-1
    ).reshape(-1, 3)
    np.testing.assert_array_equal(ref_pixels, s["light_pixels"])


def test_normed_w_and_projection_grads_match_reference(ref, sm_scene):
    """Gradients through the full shadow pipeline wrt camera depths."""
    s = sm_scene
    depth_t = t(s["depths"]["cam_coarse"]).requires_grad_(True)
    cam = s["cams"][0]
    light = s["light"]
    pd_light = t(
        np.concatenate(
            [s["light_pixels"], s["depths"]["light_coarse"][:, None]], axis=1
        )
    )
    with torch.no_grad():
        normed_light_ref = ref.eff_sm.get_normed_w(light, pd_light)
    mesh_cam = torch.cat([t(s["cam_pixels"]), depth_t.view(-1, 1)], dim=1)
    sm_ref = ref.eff_sm.run_shadow_mapping(
        s["res"], cam, light, mesh_cam, normed_light_ref, "cpu",
        mode="shadow_method_2",
    )
    sm_ref.sum().backward()
    want = depth_t.grad.numpy()

    def ours(depth):
        pd_cam = jnp.concatenate(
            [jnp.asarray(s["cam_pixels"]), depth[:, None]], axis=1
        )
        pd_l = jnp.concatenate(
            [jnp.asarray(s["light_pixels"]),
             jnp.asarray(s["depths"]["light_coarse"])[:, None]], axis=1
        )
        normed_light = our_sm.get_normed_w(
            jnp.asarray(light.camera.numpy()), pd_l
        )
        return our_sm.run_shadow_mapping(
            s["res"], jnp.asarray(cam.camera.numpy()),
            jnp.asarray(cam.eye_pos.numpy()),
            jnp.asarray(light.camera.numpy()),
            jnp.asarray(light.eye_pos.numpy()),
            pd_cam, normed_light, mode="shadow_method_2",
        ).sum()

    got = np.asarray(
        jax.grad(ours)(jnp.asarray(s["depths"]["cam_coarse"]))
    )
    denom = max(np.abs(want).max(), 1e-8)
    assert np.abs(got - want).max() / denom < 1e-3


# ---------------------------------------------------------------------------
# losses + metrics
# ---------------------------------------------------------------------------
def test_losses_match_reference(ref):
    rng = np.random.RandomState(9)
    n = 64
    results = {
        "rgb_coarse": rng.rand(n, 3).astype(np.float32),
        "rgb_fine": rng.rand(n, 3).astype(np.float32),
        "sm_coarse": rng.rand(n, 3).astype(np.float32),
        "sm_fine": rng.rand(n, 3).astype(np.float32),
        "opacity_coarse": rng.rand(n).astype(np.float32),
        "opacity_fine": rng.rand(n).astype(np.float32),
    }
    targets = rng.rand(n, 3).astype(np.float32)
    r_t = {k: t(v) for k, v in results.items()}
    r_j = {k: jnp.asarray(v) for k, v in results.items()}

    np.testing.assert_allclose(
        float(our_losses.mse_loss(r_j, jnp.asarray(targets))),
        float(ref.losses.MSELoss()(r_t, t(targets))), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(our_losses.sm_loss(r_j, jnp.asarray(targets))),
        float(ref.losses.SMMSELoss()(r_t, t(targets))), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(our_losses.opacity_loss(r_j, jnp.asarray(targets))),
        float(ref.losses.OpactiyLoss()(r_t, t(targets))), rtol=1e-6,
    )
    # empty-set early return (losses.py:52,60)
    dark = np.zeros((n, 3), np.float32)
    assert float(our_losses.opacity_loss(r_j, jnp.asarray(dark))) == 0.0
    assert ref.losses.OpactiyLoss()(r_t, t(dark)) == 0.0


def test_metrics_match_reference(ref):
    rng = np.random.RandomState(10)
    pred = rng.rand(12, 12, 3).astype(np.float32)
    gt = rng.rand(12, 12, 3).astype(np.float32)
    mask = rng.rand(12, 12) > 0.4
    np.testing.assert_allclose(
        float(our_metrics.psnr(jnp.asarray(pred), jnp.asarray(gt))),
        float(ref.metrics.psnr(t(pred), t(gt))), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(our_metrics.mse(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(mask))),
        float(ref.metrics.mse(t(pred), t(gt), torch.from_numpy(mask))),
        rtol=1e-5,
    )


def test_ssim_matches_reference(ref):
    """The reference's ``metrics.ssim`` (1 - 2*dssim, kornia-0.2.0 window 3,
    ``/root/reference/metrics.py:15-20``) driven through the cited kornia
    shim (``reference_harness._kornia_ssim``) vs our ``metrics.ssim`` —
    random images, near-identical images, and a non-default window."""
    rng = np.random.RandomState(11)
    for wnd, noise in ((3, None), (3, 0.02), (5, None)):
        pred = rng.rand(1, 3, 17, 13).astype(np.float32)
        if noise is None:
            gt = rng.rand(1, 3, 17, 13).astype(np.float32)
        else:
            gt = np.clip(
                pred + noise * rng.randn(1, 3, 17, 13).astype(np.float32),
                0, 1,
            )
        theirs = float(
            1 - 2 * ref.metrics.dssim(t(pred), t(gt), wnd, "mean")
        ) if wnd != 3 else float(ref.metrics.ssim(t(pred), t(gt)))
        ours = float(
            our_metrics.ssim(jnp.asarray(pred), jnp.asarray(gt),
                             window_size=wnd)
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# optimizers + schedulers (trajectory parity)
# ---------------------------------------------------------------------------
def _run_trajectories(ref, name, steps=30, weight_decay=0.0, lr=1e-2):
    """Run the reference optimizer (via utils.get_optimizer) and ours on the
    same params with the same synthetic gradient sequence."""
    rng = np.random.RandomState(20)
    shapes = [(5,), (3, 2)]
    init = [rng.randn(*s).astype(np.float32) for s in shapes]
    grads = [
        [np.cos(0.7 * step + i) * rng.randn(*s).astype(np.float32) * 0.5 + 0.5
         for i, s in enumerate(shapes)]
        for step in range(steps)
    ]

    hp = argparse.Namespace(optimizer=name, lr=lr, momentum=0.9,
                            weight_decay=weight_decay)
    model = torch.nn.ParameterList(
        [torch.nn.Parameter(t(a.copy())) for a in init]
    )
    opt = ref.utils.get_optimizer(hp, [model])
    for step in range(steps):
        for p, g in zip(model, grads[step]):
            p.grad = t(g)
        opt.step()
    want = [p.detach().numpy() for p in model]

    ours = get_optimizer(name, lambda _: lr, momentum=0.9,
                         weight_decay=weight_decay)
    params = [jnp.asarray(a) for a in init]
    state = ours.init(params)

    import optax

    for step in range(steps):
        updates, state = ours.update(
            [jnp.asarray(g) for g in grads[step]], state, params
        )
        params = optax.apply_updates(params, updates)
    got = [np.asarray(p) for p in params]
    return got, want


@pytest.mark.parametrize("name,wd", [
    ("sgd", 0.0), ("adam", 0.0), ("adam", 1e-3),
    ("radam", 0.0), ("radam", 1e-3), ("ranger", 0.0),
])
def test_optimizer_trajectory_matches_reference(ref, name, wd):
    got, want = _run_trajectories(ref, name, weight_decay=wd)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-6,
                                   err_msg=f"{name} wd={wd}")


@pytest.mark.parametrize("sched,warmup", [
    ("steplr", 0), ("cosine", 0), ("poly", 0), ("steplr", 3),
])
def test_lr_schedule_matches_reference(ref, sched, warmup):
    epochs, lr = 16, 5e-4
    hp = argparse.Namespace(
        optimizer="adam", lr=lr, momentum=0.9, weight_decay=0.0,
        lr_scheduler=sched, decay_step=[2, 4, 8], decay_gamma=0.5,
        num_epochs=epochs, poly_exp=0.9, warmup_epochs=warmup,
        warmup_multiplier=2.0,
    )
    # 'poly' needs LambdaLR which utils/__init__.py references without
    # importing (a latent reference NameError) — inject it like the fork's
    # runtime environment effectively had it.
    if sched == "poly" and not hasattr(ref.utils, "LambdaLR"):
        ref.utils.LambdaLR = torch.optim.lr_scheduler.LambdaLR
    p = torch.nn.Parameter(torch.zeros(1))
    opt = ref.utils.get_optimizer(hp, [torch.nn.ParameterList([p])])
    scheduler = ref.utils.get_scheduler(hp, opt)
    want = []
    for _ in range(epochs):
        want.append(ref.utils.get_learning_rate(opt))
        p.grad = torch.zeros(1)
        opt.step()
        scheduler.step()

    schedule = make_lr_schedule(
        lr, sched, steps_per_epoch=1, num_epochs=epochs,
        decay_step=[2, 4, 8], decay_gamma=0.5, poly_exp=0.9,
        warmup_multiplier=2.0, warmup_epochs=warmup, optimizer="adam",
    )
    got = [float(schedule(e)) for e in range(epochs)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9,
                               err_msg=f"{sched} warmup={warmup}")


def test_cosine_warmup_documented_divergence(ref):
    """cosine + warmup: the reference's GradualWarmupScheduler seeds torch's
    RECURSIVE CosineAnnealingLR formula one step early at the `finished`
    transition (warmup_scheduler.py:25-30 calls after_scheduler.get_lr() with
    last_epoch=0 through the non-closed-form path), inflating every
    post-warmup LR by 2/(1+cos(pi/T)) — the LR even EXCEEDS the warmup target
    peak.  Document-and-fix (SURVEY.md §7 policy): we use the clean closed
    form, asserted here to track the reference within that known ~1% factor
    and to never overshoot the peak."""
    epochs, lr, warmup, mult = 16, 5e-4, 4, 2.0
    hp = argparse.Namespace(
        optimizer="adam", lr=lr, momentum=0.9, weight_decay=0.0,
        lr_scheduler="cosine", decay_step=[2], decay_gamma=0.5,
        num_epochs=epochs, poly_exp=0.9, warmup_epochs=warmup,
        warmup_multiplier=mult,
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = ref.utils.get_optimizer(hp, [torch.nn.ParameterList([p])])
    scheduler = ref.utils.get_scheduler(hp, opt)
    want = []
    for _ in range(epochs):
        want.append(ref.utils.get_learning_rate(opt))
        p.grad = torch.zeros(1)
        opt.step()
        scheduler.step()

    # the reference bug: first post-warmup epoch exceeds the peak lr
    peak = mult * lr
    assert want[warmup + 1] > peak
    inflation = 2.0 / (1.0 + np.cos(np.pi / epochs))

    schedule = make_lr_schedule(
        lr, "cosine", steps_per_epoch=1, num_epochs=epochs,
        warmup_multiplier=mult, warmup_epochs=warmup, optimizer="adam",
    )
    got = np.array([float(schedule(e)) for e in range(epochs)])
    assert (got <= peak * (1 + 1e-5)).all()  # our fix never overshoots
    np.testing.assert_allclose(got[: warmup + 1], want[: warmup + 1],
                               rtol=1e-6)  # identical ramp
    np.testing.assert_allclose(got[warmup + 1:],
                               np.array(want[warmup + 1:]) / inflation,
                               rtol=1e-4)  # identical shape modulo the bug


def test_ckpt_prefix_filter_semantics_match_reference(ref, tmp_path):
    """The reference's ``extract_model_state_dict`` (utils/__init__.py:55-70)
    vs ours: same kept/dropped key sets for model_name selection + prefix
    ignore, lightning-wrapper unwrap included."""
    sd = {
        "nerf_coarse.sigma.weight": torch.zeros(1, 4),
        "nerf_coarse.sigma.bias": torch.zeros(1),
        "nerf_coarse.rgb.0.weight": torch.zeros(3, 4),
        "nerf_fine.sigma.weight": torch.ones(1, 4),
        "loss.coeff": torch.tensor(2000.0),
    }
    p_ref = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "optimizer_states": []}, p_ref)
    kept_ref = ref.utils.extract_model_state_dict(
        p_ref, model_name="nerf_coarse", prefixes_to_ignore=["rgb"]
    )

    from nerf_pl_tpu.training import checkpoints

    tree = {
        "nerf_coarse": {
            "sigma": {"weight": np.zeros((1, 4), np.float32),
                      "bias": np.zeros((1,), np.float32)},
            "rgb": {"0": {"weight": np.zeros((3, 4), np.float32)}},
        },
        "nerf_fine": {"sigma": {"weight": np.ones((1, 4), np.float32)}},
        "loss": {"coeff": np.float32(2000.0)},
    }
    p_ours = str(tmp_path / "ours.ckpt")
    checkpoints.save_checkpoint(p_ours, tree)
    kept_ours = checkpoints.extract_model_state_dict(
        p_ours, model_name="nerf_coarse", prefixes_to_ignore=["rgb"]
    )

    norm = lambda keys: {k.replace("/", ".") for k in keys}  # noqa: E731
    assert norm(kept_ours) == set(kept_ref) == {"sigma.weight", "sigma.bias"}


def test_rgb_sm_efficient_sm_matches_reference(ref, sm_scene):
    """models/rendering_rgb_sm.py::efficient_sm writes the joint trainer's
    ``sm_*`` keys (:458,:477) — same math as the shadows variant but keyed
    so RGB and shadow predictions coexist."""
    s = sm_scene
    ppc = {"eye_pos": [t(e) for e in s["cam_eyes"]],
           "camera": [t(m) for m in s["cam_ms"]]}
    with torch.no_grad():
        want = ref.rendering_rgb_sm.efficient_sm(
            t(s["cam_pixels"]), t(s["light_pixels"]),
            {"depth_coarse": t(s["depths"]["cam_coarse"]),
             "depth_fine": t(s["depths"]["cam_fine"])},
            {"depth_coarse": t(s["depths"]["light_coarse"]),
             "depth_fine": t(s["depths"]["light_fine"])},
            ppc, s["light"], s["res"], fine_sampling=True,
            Light_N_importance=8, shadow_method="shadow_method_2",
        )
    got = our_sm.efficient_sm(
        jnp.asarray(s["cam_pixels"]), jnp.asarray(s["light_pixels"]),
        {"depth_coarse": jnp.asarray(s["depths"]["cam_coarse"]),
         "depth_fine": jnp.asarray(s["depths"]["cam_fine"])},
        {"depth_coarse": jnp.asarray(s["depths"]["light_coarse"]),
         "depth_fine": jnp.asarray(s["depths"]["light_fine"])},
        jnp.asarray(s["cam_ms"]), jnp.asarray(s["cam_eyes"]),
        jnp.asarray(s["light"].camera.numpy()),
        jnp.asarray(s["light"].eye_pos.numpy()),
        s["res"], fine_sampling=True, light_has_fine=True,
        shadow_method="shadow_method_2",
        pose_idx=jnp.asarray(s["pose_idx"]), num_poses=3, out_prefix="sm",
    )
    for k in ("sm_coarse", "sm_fine"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_poly_warmup_schedule_matches_reference(ref):
    """poly + GradualWarmupScheduler (LambdaLR path)."""
    epochs, lr, warmup = 12, 5e-4, 3
    hp = argparse.Namespace(
        optimizer="adam", lr=lr, momentum=0.9, weight_decay=0.0,
        lr_scheduler="poly", decay_step=[2], decay_gamma=0.5,
        num_epochs=epochs, poly_exp=0.9, warmup_epochs=warmup,
        warmup_multiplier=2.0,
    )
    if not hasattr(ref.utils, "LambdaLR"):  # latent reference NameError
        ref.utils.LambdaLR = torch.optim.lr_scheduler.LambdaLR
    p = torch.nn.Parameter(torch.zeros(1))
    opt = ref.utils.get_optimizer(hp, [torch.nn.ParameterList([p])])
    scheduler = ref.utils.get_scheduler(hp, opt)
    want = []
    for _ in range(epochs):
        want.append(ref.utils.get_learning_rate(opt))
        p.grad = torch.zeros(1)
        opt.step()
        scheduler.step()
    schedule = make_lr_schedule(
        lr, "poly", steps_per_epoch=1, num_epochs=epochs, poly_exp=0.9,
        warmup_multiplier=2.0, warmup_epochs=warmup, optimizer="adam",
    )
    got = [float(schedule(e)) for e in range(epochs)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)
