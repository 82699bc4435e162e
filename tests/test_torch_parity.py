"""Full-render allclose parity against a torch-ops fixture (the BASELINE
north-star: forward images AND pixel gradients must match the PyTorch
reference semantics on identical inputs/weights/randomness).

The fixture re-implements the reference math contract (SURVEY.md §2 key
formulas) directly with torch ops in a flat functional style; all random
draws (perturb, sigma noise, importance u/jitter) are injected identically
into both sides via the renderer's ``overrides``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.ops.rendering import render_rays


def torch_nerf(p, x, sigma_only=False):
    tt = lambda a: (
        a if isinstance(a, torch.Tensor) else torch.from_numpy(np.asarray(a))
    )
    xyz = x[:, :63] if not sigma_only else x
    h = xyz
    for i, layer in enumerate(p["xyz_layers"]):
        if i == 4:
            h = torch.cat([xyz, h], dim=-1)
        h = torch.relu(h @ tt(layer["w"]) + tt(layer["b"]))
    sigma = h @ tt(p["sigma"]["w"]) + tt(p["sigma"]["b"])
    if sigma_only:
        return sigma
    fin = h @ tt(p["xyz_final"]["w"]) + tt(p["xyz_final"]["b"])
    d = torch.cat([fin, x[:, 63:]], dim=-1)
    d = torch.relu(d @ tt(p["dir_layer"]["w"]) + tt(p["dir_layer"]["b"]))
    rgb = torch.sigmoid(d @ tt(p["rgb"]["w"]) + tt(p["rgb"]["b"]))
    return torch.cat([rgb, sigma], dim=-1)


def torch_posenc(x, n):
    out = [x]
    for k in range(n):
        out += [torch.sin(2.0**k * x), torch.cos(2.0**k * x)]
    return torch.cat(out, dim=-1)


def torch_render(pc, pf, rays_t, z_perturb, noise_c, noise_f, u, jit_,
                 n_samples, n_imp, white_back=True):
    """Coarse+fine render with the reference's exact math, torch ops."""
    n = rays_t.shape[0]
    o, d = rays_t[:, :3], rays_t[:, 3:6]
    near, far = rays_t[:, 6:7], rays_t[:, 7:8]
    steps = torch.linspace(0, 1, n_samples, dtype=rays_t.dtype)
    z = near * (1 - steps) + far * steps
    mid = 0.5 * (z[:, :-1] + z[:, 1:])
    upper = torch.cat([mid, z[:, -1:]], -1)
    lower = torch.cat([z[:, :1], mid], -1)
    z = lower + (upper - lower) * z_perturb

    def composite(params, z_vals, noise):
        xyz = o[:, None] + d[:, None] * z_vals[..., None]
        s = z_vals.shape[1]
        emb_x = torch_posenc(xyz.reshape(-1, 3), 10)
        emb_d = torch_posenc(d, 4).repeat_interleave(s, dim=0)
        out = torch_nerf(params, torch.cat([emb_x, emb_d], -1)).view(n, s, 4)
        rgbs, sig = out[..., :3], out[..., 3]
        deltas = torch.cat(
            [z_vals[:, 1:] - z_vals[:, :-1],
             torch.full_like(z_vals[:, :1], 1e10)], -1
        ) * torch.norm(d, dim=-1, keepdim=True)
        alphas = 1 - torch.exp(-deltas * torch.relu(sig + noise))
        shifted = torch.cat(
            [torch.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1
        )
        w = alphas * torch.cumprod(shifted, -1)[:, :-1]
        rgb = (w[..., None] * rgbs).sum(-2)
        if white_back:
            rgb = rgb + (1 - w.sum(-1, keepdim=True))
        return rgb, (w * z_vals).sum(-1), w

    rgb_c, depth_c, w_c = composite(pc, z, noise_c)

    # fork sample_pdf (models/rendering.py:14-48) with injected u/jitter
    wmid = w_c[:, 1:-1].detach() + 1e-5
    pdf = wmid / wmid.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
    inds = torch.searchsorted(cdf, u, right=True).float() - 1.0
    inds = torch.clamp_min(inds, 0.0)
    z_steps = (inds + jit_) / wmid.shape[1]
    z_fine = near * (1 - z_steps) + far * z_steps
    z_all, _ = torch.sort(torch.cat([z, z_fine.detach()], -1), -1)

    rgb_f, depth_f, w_f = composite(pf, z_all, noise_f)
    return rgb_c, rgb_f, depth_c, depth_f


@pytest.fixture(scope="module")
def setup():
    kc, kf, kr = jax.random.split(jax.random.PRNGKey(7), 3)
    pc, pf = init_nerf(kc), init_nerf(kf)
    n, ns, ni = 24, 16, 12
    rng = np.random.RandomState(0)
    o = rng.randn(n, 3).astype(np.float32) * 0.2
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)],
        1,
    )
    ov = {
        "perturb_rand": rng.rand(n, ns).astype(np.float32),
        "noise_coarse": rng.randn(n, ns).astype(np.float32),
        "noise_fine": rng.randn(n, ns + ni).astype(np.float32),
        "u": rng.rand(n, ni).astype(np.float32),
        "jitter": rng.rand(n, ni).astype(np.float32),
    }
    return pc, pf, rays, ov, ns, ni


def test_forward_image_allclose(setup):
    pc, pf, rays, ov, ns, ni = setup
    r = render_rays(
        pc, pf, jnp.asarray(rays), None, N_samples=ns, N_importance=ni,
        perturb=1.0, noise_std=1.0, white_back=True,
        overrides={k: jnp.asarray(v) for k, v in ov.items()},
    )
    rgb_c, rgb_f, depth_c, depth_f = torch_render(
        pc, pf, torch.from_numpy(rays),
        torch.from_numpy(ov["perturb_rand"]),
        torch.from_numpy(ov["noise_coarse"]),
        torch.from_numpy(ov["noise_fine"]),
        torch.from_numpy(ov["u"]), torch.from_numpy(ov["jitter"]), ns, ni,
    )
    np.testing.assert_allclose(
        np.asarray(r["rgb_coarse"]), rgb_c.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r["rgb_fine"]), rgb_f.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r["depth_coarse"]), depth_c.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r["depth_fine"]), depth_f.numpy(), rtol=1e-4, atol=1e-4
    )


def test_pixel_gradient_allclose(setup):
    """∂loss/∂params agree between jax and the torch fixture (the 'pixel
    gradients' north-star: gradients of the image loss)."""
    pc, pf, rays, ov, ns, ni = setup
    rng = np.random.RandomState(3)
    target = rng.rand(rays.shape[0], 3).astype(np.float32)

    def jax_loss(params):
        r = render_rays(
            params["c"], params["f"], jnp.asarray(rays), None, N_samples=ns,
            N_importance=ni, perturb=1.0, noise_std=1.0, white_back=True,
            overrides={k: jnp.asarray(v) for k, v in ov.items()},
        )
        t = jnp.asarray(target)
        return jnp.mean((r["rgb_coarse"] - t) ** 2) + jnp.mean(
            (r["rgb_fine"] - t) ** 2
        )

    gj = jax.grad(jax_loss)({"c": pc, "f": pf})

    # torch side: leaf tensors with requires_grad
    def to_t(p):
        return jax.tree_util.tree_map(
            lambda a: torch.tensor(np.asarray(a), requires_grad=True), p
        )

    tc, tf = to_t(pc), to_t(pf)
    rgb_c, rgb_f, _, _ = torch_render(
        tc, tf, torch.from_numpy(rays),
        torch.from_numpy(ov["perturb_rand"]),
        torch.from_numpy(ov["noise_coarse"]),
        torch.from_numpy(ov["noise_fine"]),
        torch.from_numpy(ov["u"]), torch.from_numpy(ov["jitter"]), ns, ni,
    )
    tt = torch.from_numpy(target)
    loss = ((rgb_c - tt) ** 2).mean() + ((rgb_f - tt) ** 2).mean()
    loss.backward()

    for g_jax, t_leaf in zip(
        jax.tree_util.tree_leaves(gj["c"]) + jax.tree_util.tree_leaves(gj["f"]),
        jax.tree_util.tree_leaves(tc) + jax.tree_util.tree_leaves(tf),
    ):
        a = np.asarray(g_jax)
        b = t_leaf.grad.numpy()
        denom = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / denom < 1e-3
