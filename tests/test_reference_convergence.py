"""Convergence equivalence against the reference trainer's math (VERDICT.md
round-1 item #4 — the strongest lego-PSNR-parity proxy available here, since
no nerf_synthetic data exists in this environment).

Both sides start from IDENTICAL weights, consume IDENTICAL ray batches from
the same Blender-format scene, and take IDENTICAL Adam steps (lr 5e-4,
eps 1e-8 — the reference recipe, README.md:75-83):

  * torch side: the reference's own ``models/rendering.py::render_rays`` +
    ``losses.MSELoss`` + ``torch.optim.Adam`` (what PL's training_step does,
    train.py:103-117, minus the Lightning wrapper).
  * jax side: our ``render_rays`` + ``mse_loss`` + ``optax.adam``.

With perturb=0 / noise_std=0 the coarse-only run is fully deterministic; the
coarse+fine run injects identical importance-sampling randomness per step.
Loss trajectories and final parameters must track within float-accumulation
tolerance over hundreds of steps.  Results are also recorded in
docs/results.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

torch = pytest.importorskip("torch")

from reference_harness import InjectRandom, load_reference, params_to_ref_nerf

from nerf_pl_tpu.data.blender import BlenderDataset
from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.ops.rendering import render_rays

LR = 5e-4
BATCH = 128
NS = 8


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def ray_buffer(blender_root):
    ds = BlenderDataset(str(blender_root), "train", img_wh=(16, 16),
                        near=2.0, far=6.0, white_back=True)
    # one fixed global shuffle, then sequential batches (identical both sides)
    perm = np.random.RandomState(0).permutation(len(ds.all_rays))
    return ds.all_rays[perm], ds.all_rgbs[perm]


def _batches(rays, rgbs, steps):
    n = rays.shape[0]
    for s in range(steps):
        lo = (s * BATCH) % (n - BATCH + 1)
        yield rays[lo:lo + BATCH], rgbs[lo:lo + BATCH]


def test_coarse_only_trajectories_track(ref, ray_buffer):
    """200 deterministic steps: per-step losses match and both converge."""
    steps = 200
    rays_all, rgbs_all = ray_buffer
    params0 = init_nerf(jax.random.PRNGKey(0), D=8, W=32)

    # ---- jax side -----------------------------------------------------
    opt = optax.adam(LR, eps=1e-8)

    @jax.jit
    def step(params, opt_state, rays, rgbs):
        def loss_fn(p):
            r = render_rays(p, None, rays, None, N_samples=NS,
                            N_importance=0, perturb=0.0, noise_std=0.0,
                            white_back=True, mode="rgb")
            return jnp.mean((r["rgb_coarse"] - rgbs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = params0, opt.init(params0)
    jax_losses = []
    for rays, rgbs in _batches(rays_all, rgbs_all, steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(rays), jnp.asarray(rgbs)
        )
        jax_losses.append(float(loss))

    # ---- torch side: the reference's own renderer + loss ----------------
    model = params_to_ref_nerf(params0, ref.nerf.NeRF, requires_grad=True)
    embeddings = [ref.nerf.Embedding(3, 10), ref.nerf.Embedding(3, 4)]
    criterion = ref.losses.MSELoss()
    topt = torch.optim.Adam(model.parameters(), lr=LR, eps=1e-8)
    torch_losses = []
    for rays, rgbs in _batches(rays_all, rgbs_all, steps):
        res = ref.rendering.render_rays(
            [model], embeddings, torch.from_numpy(rays), N_samples=NS,
            perturb=0.0, noise_std=0.0, N_importance=0, white_back=True,
        )
        loss = criterion(res, torch.from_numpy(rgbs))
        topt.zero_grad()
        loss.backward()
        topt.step()
        torch_losses.append(float(loss))

    jl, tl = np.array(jax_losses), np.array(torch_losses)
    # identical first step (same weights, same batch, pre-update)
    np.testing.assert_allclose(jl[0], tl[0], rtol=1e-5)
    # trajectories track essentially exactly for dozens of steps, then
    # float32 bifurcation lets individual late steps wander a few percent —
    # so per-step early + smoothed (20-step means) late
    np.testing.assert_allclose(jl[:50], tl[:50], rtol=5e-3, atol=1e-6)
    smooth = lambda a: a.reshape(-1, 20).mean(axis=1)  # noqa: E731
    np.testing.assert_allclose(smooth(jl), smooth(tl), rtol=0.1, atol=1e-5)
    # both actually converge, equally far
    assert tl[-10:].mean() < 0.25 * tl[0]
    assert abs(jl[-10:].mean() - tl[-10:].mean()) < 0.05 * tl[0]

    # final parameters stay close leaf-by-leaf in relative L2 — after the
    # float32 bifurcation the models walk the same valley, not the same
    # bitstream, so single low-signal elements may drift a couple percent
    # while the leaf as a whole stays put
    final_ref = params_to_ref_nerf(params, ref.nerf.NeRF)
    for (n1, p_ours), (n2, p_ref) in zip(
        final_ref.named_parameters(), model.named_parameters()
    ):
        assert n1 == n2
        a, b = p_ours.detach().numpy(), p_ref.detach().numpy()
        rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-8)
        assert rel_l2 < 0.05, f"{n1}: {rel_l2}"


def test_coarse_fine_trajectories_track(ref, ray_buffer):
    """60 coarse+fine steps with identical injected importance sampling."""
    steps = 60
    ni = 8
    rays_all, rgbs_all = ray_buffer
    kc, kf = jax.random.split(jax.random.PRNGKey(1))
    p0 = {"c": init_nerf(kc, D=8, W=32), "f": init_nerf(kf, D=8, W=32)}
    draw_rng = np.random.RandomState(123)
    draws = [
        (draw_rng.rand(BATCH, ni).astype(np.float32),
         draw_rng.rand(BATCH, ni).astype(np.float32))
        for _ in range(steps)
    ]

    opt = optax.adam(LR, eps=1e-8)

    @jax.jit
    def step(params, opt_state, rays, rgbs, u, jitter):
        def loss_fn(p):
            r = render_rays(p["c"], p["f"], rays, None, N_samples=NS,
                            N_importance=ni, perturb=0.0, noise_std=0.0,
                            white_back=True, mode="rgb",
                            overrides={"u": u, "jitter": jitter})
            return (jnp.mean((r["rgb_coarse"] - rgbs) ** 2)
                    + jnp.mean((r["rgb_fine"] - rgbs) ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = p0, opt.init(p0)
    jax_losses = []
    for (rays, rgbs), (u, jit_) in zip(
        _batches(rays_all, rgbs_all, steps), draws
    ):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(rays), jnp.asarray(rgbs),
            jnp.asarray(u), jnp.asarray(jit_),
        )
        jax_losses.append(float(loss))

    mc = params_to_ref_nerf(p0["c"], ref.nerf.NeRF, requires_grad=True)
    mf = params_to_ref_nerf(p0["f"], ref.nerf.NeRF, requires_grad=True)
    embeddings = [ref.nerf.Embedding(3, 10), ref.nerf.Embedding(3, 4)]
    criterion = ref.losses.MSELoss()
    topt = torch.optim.Adam(
        list(mc.parameters()) + list(mf.parameters()), lr=LR, eps=1e-8
    )
    torch_losses = []
    for (rays, rgbs), (u, jit_) in zip(
        _batches(rays_all, rgbs_all, steps), draws
    ):
        # perturb=0/noise_std=0: the meaningful draws are sample_pdf's u and
        # jitter (the reference ignores det, models/rendering.py:39,44);
        # torch.randn is still called unconditionally and multiplied by 0, so
        # feed zeros through the queue in draw order (coarse randn comes
        # BEFORE sample_pdf's rand).
        with InjectRandom([
            ("randn", np.zeros((BATCH, NS), np.float32)),
            ("rand", u),
            ("rand_like", jit_),
            ("randn", np.zeros((BATCH, NS + ni), np.float32)),
        ]):
            res = ref.rendering.render_rays(
                [mc, mf], embeddings, torch.from_numpy(rays), N_samples=NS,
                perturb=0.0, noise_std=0.0, N_importance=ni, white_back=True,
            )
        loss = criterion(res, torch.from_numpy(rgbs))
        topt.zero_grad()
        loss.backward()
        topt.step()
        torch_losses.append(float(loss))

    jl, tl = np.array(jax_losses), np.array(torch_losses)
    np.testing.assert_allclose(jl[0], tl[0], rtol=1e-5)
    np.testing.assert_allclose(jl, tl, rtol=2e-2, atol=1e-5)
    assert tl[-5:].mean() < 0.6 * tl[0]
    assert abs(jl[-5:].mean() - tl[-5:].mean()) < 0.05 * tl[0]
