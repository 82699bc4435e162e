import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.models.nerf import init_nerf, nerf_apply
from nerf_pl_tpu.models.embedding import posenc
from nerf_pl_tpu.ops.rendering import render_rays


@pytest.fixture(scope="module")
def setup():
    kc, kf, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    pc, pf = init_nerf(kc), init_nerf(kf)
    n = 16
    o = jax.random.normal(kr, (n, 3)) * 0.2
    d = jax.random.normal(jax.random.fold_in(kr, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 2.0), jnp.full((n, 1), 6.0)], -1
    )
    return pc, pf, rays


def test_key_sets_by_mode(setup):
    pc, pf, rays = setup
    k = jax.random.PRNGKey(1)
    kw = dict(N_samples=8, N_importance=4, perturb=1.0, noise_std=1.0)
    r = render_rays(pc, pf, rays, k, mode="rgb", **kw)
    assert set(r) == {
        "rgb_coarse", "depth_coarse", "opacity_coarse",
        "rgb_fine", "depth_fine", "opacity_fine",
    }
    r = render_rays(pc, pf, rays, k, mode="sigma", **kw)
    assert set(r) == {
        "depth_coarse", "opacity_coarse", "disp_map_coarse",
        "depth_fine", "opacity_fine", "disp_map_fine",
    }
    r = render_rays(pc, pf, rays, k, mode="rgb_disp", **kw)
    assert {"rgb_coarse", "disp_map_coarse", "rgb_fine", "disp_map_fine"} <= set(r)
    # test_time drops coarse rgb/depth (models/rendering.py:237-241)
    r = render_rays(pc, pf, rays, k, mode="rgb", test_time=True, **kw)
    assert "rgb_coarse" not in r and "opacity_coarse" in r and "rgb_fine" in r


def test_coarse_only(setup):
    pc, _, rays = setup
    r = render_rays(pc, None, rays, jax.random.PRNGKey(2), N_samples=8,
                    N_importance=0, perturb=0.0, noise_std=0.0)
    assert set(r) == {"rgb_coarse", "depth_coarse", "opacity_coarse"}


def naive_render(pc, rays, z_vals, noise):
    """Independent numpy/jax mixed re-implementation of the coarse pass."""
    o, d = np.asarray(rays[:, :3]), np.asarray(rays[:, 3:6])
    xyz = o[:, None] + d[:, None] * np.asarray(z_vals)[..., None]
    n, s, _ = xyz.shape
    emb_x = posenc(jnp.asarray(xyz.reshape(-1, 3)), 10)
    emb_d = posenc(rays[:, 3:6], 4)
    emb_d = jnp.repeat(emb_d, s, axis=0)
    out = np.asarray(
        nerf_apply(pc, jnp.concatenate([emb_x, emb_d], -1))
    ).reshape(n, s, 4)
    rgbs, sigmas = out[..., :3], out[..., 3]
    z = np.asarray(z_vals)
    rgb_f = np.zeros((n, 3), np.float32)
    depth_f = np.zeros(n, np.float32)
    for i in range(n):
        deltas = np.concatenate([z[i, 1:] - z[i, :-1], [1e10]]) * np.linalg.norm(d[i])
        a = 1 - np.exp(-deltas * np.maximum(sigmas[i] + noise[i], 0))
        T = np.cumprod(np.concatenate([[1.0], 1 - a + 1e-10]))[:-1]
        w = a * T
        rgb_f[i] = (w[:, None] * rgbs[i]).sum(0)
        depth_f[i] = (w * z[i]).sum()
    return rgb_f, depth_f


def test_render_matches_naive_with_injected_randomness(setup):
    pc, _, rays = setup
    n, s = rays.shape[0], 8
    rng = np.random.RandomState(0)
    noise = rng.randn(n, s).astype(np.float32)
    r = render_rays(
        pc, None, rays, None, N_samples=s, N_importance=0, perturb=0.0,
        noise_std=1.0, overrides={"noise_coarse": jnp.asarray(noise)},
    )
    near, far = np.asarray(rays[:, 6]), np.asarray(rays[:, 7])
    z = near[:, None] * (1 - np.linspace(0, 1, s)) + far[:, None] * np.linspace(0, 1, s)
    rgb, depth = naive_render(pc, rays, z, noise)
    np.testing.assert_allclose(np.asarray(r["rgb_coarse"]), rgb, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r["depth_coarse"]), depth, rtol=1e-4, atol=1e-4)


def test_gradients_flow_and_finite(setup):
    pc, pf, rays = setup

    def loss(params):
        r = render_rays(
            params["c"], params["f"], rays, jax.random.PRNGKey(3),
            N_samples=8, N_importance=8, perturb=1.0, noise_std=1.0,
        )
        return jnp.mean(r["rgb_fine"] ** 2) + jnp.mean(r["rgb_coarse"] ** 2)

    g = jax.grad(loss)({"c": pc, "f": pf})
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # both models receive gradient
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree_util.tree_leaves(g["c"]))
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree_util.tree_leaves(g["f"]))


def test_white_back_background_is_white(setup):
    """Rays that hit nothing (sigma ~ -inf via far-off scene) composite to 1."""
    pc, _, rays = setup
    # scale sigma head down to make near-empty density
    import jax.tree_util as jtu

    pzero = jtu.tree_map(lambda x: x * 0.0, pc)
    r = render_rays(pzero, None, rays, None, N_samples=8, N_importance=0,
                    perturb=0.0, noise_std=0.0, white_back=True)
    rgb = np.asarray(r["rgb_coarse"])
    assert (rgb > 0.9).all()


def test_remat_fine_matches_plain():
    """--remat_fine must be numerically transparent (same fwd and grads)."""
    import jax
    import jax.flatten_util  # noqa: F401 — jax.flatten_util is lazy

    from nerf_pl_tpu.models.nerf import init_nerf
    from nerf_pl_tpu.ops.rendering import render_rays

    key = jax.random.PRNGKey(0)
    params = {"coarse": init_nerf(key), "fine": init_nerf(jax.random.fold_in(key, 1))}
    rays = jnp.concatenate(
        [jax.random.normal(jax.random.fold_in(key, 2), (8, 6)),
         jnp.full((8, 1), 2.0), jnp.full((8, 1), 6.0)], axis=1
    )

    def loss(p, remat):
        out = render_rays(
            p["coarse"], p["fine"], rays, jax.random.PRNGKey(7),
            N_samples=8, N_importance=8, perturb=1.0, noise_std=1.0,
            remat_fine=remat,
        )
        return jnp.mean(out["rgb_fine"] ** 2) + jnp.mean(out["rgb_coarse"] ** 2)

    (l0, g0) = jax.value_and_grad(lambda p: loss(p, False))(params)
    (l1, g1) = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert np.allclose(l0, l1, rtol=1e-6)
    a = jax.flatten_util.ravel_pytree(g0)[0]
    b = jax.flatten_util.ravel_pytree(g1)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_dir_freqs_is_respected():
    """Regression: render_rays silently ignored non-default dir_freqs."""
    import jax

    from nerf_pl_tpu.models.nerf import init_nerf
    from nerf_pl_tpu.ops.rendering import render_rays

    key = jax.random.PRNGKey(0)
    params = init_nerf(key, in_channels_dir=3 + 2 * 6 * 3)  # 6 dir freqs
    rays = jnp.concatenate(
        [jax.random.normal(jax.random.fold_in(key, 2), (4, 6)),
         jnp.full((4, 1), 2.0), jnp.full((4, 1), 6.0)], axis=1
    )
    out = render_rays(
        params, None, rays, None, N_samples=8, N_importance=0,
        perturb=0.0, noise_std=0.0, dir_freqs=6,
    )
    assert out["rgb_coarse"].shape == (4, 3)


def test_key_none_requires_determinism_or_overrides():
    import jax

    from nerf_pl_tpu.models.nerf import init_nerf
    from nerf_pl_tpu.ops.rendering import render_rays

    params = init_nerf(jax.random.PRNGKey(0))
    rays = jnp.concatenate(
        [jnp.zeros((4, 6)), jnp.full((4, 1), 2.0), jnp.full((4, 1), 6.0)], 1
    )
    with pytest.raises(ValueError, match="key=None"):
        render_rays(params, None, rays, None, N_samples=4, N_importance=0,
                    perturb=1.0, noise_std=1.0)
    # deterministic settings are fine without a key
    out = render_rays(params, None, rays, None, N_samples=4, N_importance=0,
                      perturb=0.0, noise_std=0.0)
    assert out["rgb_coarse"].shape == (4, 3)
