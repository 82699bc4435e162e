"""Multi-chip semantics on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_pl_tpu.config import Config
from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from nerf_pl_tpu.tools.render import render_image
from nerf_pl_tpu.training.optim import get_optimizer
from nerf_pl_tpu.training.trainer import make_epoch_fn


def _toy_data(n, key):
    o = jax.random.normal(key, (n, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    nf = jnp.ones((n, 1))
    rays = jnp.concatenate([o, d, 2 * nf, 6 * nf], -1)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    return np.asarray(rays), np.asarray(rgbs)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_epoch_fn_runs_on_mesh_and_params_stay_replicated():
    mesh = make_mesh(8)
    cfg = Config(N_samples=4, N_importance=4, batch_size=4, perturb=1.0,
                 noise_std=1.0)
    opt = get_optimizer("adam", lambda s: 1e-3)
    epoch_fn = make_epoch_fn(cfg, mesh, opt, white_back=True)
    params = {"coarse": init_nerf(jax.random.PRNGKey(0)),
              "fine": init_nerf(jax.random.PRNGKey(1))}
    opt_state = opt.init(params)
    rays, rgbs = _toy_data(8 * 8, jax.random.PRNGKey(2))  # 2 steps/device
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    rays_s = shard_rays(rays, mesh)
    rgbs_s = shard_rays(rgbs, mesh)
    params, opt_state, losses, psnrs = epoch_fn(
        params, opt_state, rays_s, rgbs_s, jax.random.PRNGKey(3)
    )
    assert losses.shape == (2,)
    assert np.isfinite(np.asarray(losses)).all()
    # updated params identical on every device (grads were pmean'd)
    w = params["coarse"]["sigma"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_grad_allreduce_matches_single_device():
    """Same per-device batch on 8 devices == big-batch single device step."""
    from nerf_pl_tpu.ops.rendering import render_rays

    cfg = Config(N_samples=4, N_importance=0, batch_size=8, perturb=0.0,
                 noise_std=0.0)
    params = {"coarse": init_nerf(jax.random.PRNGKey(0))}
    rays, rgbs = _toy_data(64, jax.random.PRNGKey(5))

    def loss_fn(p, r, c):
        out = render_rays(p["coarse"], None, r, None, N_samples=4,
                          perturb=0.0, noise_std=0.0)
        return jnp.mean((out["rgb_coarse"] - c) ** 2)

    g_global = jax.grad(loss_fn)(params, jnp.asarray(rays), jnp.asarray(rgbs))

    from jax.sharding import PartitionSpec as P
    from nerf_pl_tpu.parallel.mesh import shard_map

    mesh = make_mesh(8)

    def device_grad(p, r, c):
        g = jax.grad(loss_fn)(p, r, c)
        return jax.lax.pmean(g, "rays")

    fn = shard_map(device_grad, mesh, in_specs=(P(), P("rays"), P("rays")),
                   out_specs=P())
    g_mesh = fn(replicate(params, mesh), shard_rays(rays, mesh),
                shard_rays(rgbs, mesh))
    for a, b in zip(jax.tree_util.tree_leaves(g_global),
                    jax.tree_util.tree_leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_render_image_sharded_matches_single():
    params = {"coarse": init_nerf(jax.random.PRNGKey(0))}
    rays, _ = _toy_data(100, jax.random.PRNGKey(6))
    kw = dict(N_samples=4, N_importance=0, perturb=0.0, noise_std=0.0)
    single = render_image(params, jnp.asarray(rays), jax.random.PRNGKey(7),
                          chunk=32, mesh=None, **kw)
    mesh = make_mesh(8)
    multi = render_image(params, jnp.asarray(rays), jax.random.PRNGKey(7),
                         chunk=32, mesh=mesh, **kw)
    for k in single:
        np.testing.assert_allclose(np.asarray(single[k]), np.asarray(multi[k]),
                                   rtol=2e-5, atol=1e-6)


def test_render_image_sharded_with_packed_kernel(monkeypatch):
    """The packed channel-major fused kernel INSIDE the sharded whole-image
    render (shard_map over the 8-device mesh + pallas interpret) — the
    combination a pod user's validation runs; nothing else executes it."""
    import nerf_pl_tpu.ops.fused_mlp as fm
    import nerf_pl_tpu.ops.rendering as rend

    orig = fm.fused_nerf_apply_raw_t

    def interp(params, x_t, sigma_only=False, **kw):
        return orig(params, x_t, sigma_only=sigma_only,
                    compute_dtype=jnp.float32, block=16, interpret=True,
                    stash_blocks=None)

    monkeypatch.setattr(rend, "fused_nerf_apply_raw_t", interp)

    # the fused kernel is specialized to the reference arch (D8/W256)
    params = {"coarse": init_nerf(jax.random.PRNGKey(0))}
    rays, _ = _toy_data(64, jax.random.PRNGKey(6))
    kw = dict(N_samples=4, N_importance=0, perturb=0.0, noise_std=0.0)
    plain = render_image(params, jnp.asarray(rays), jax.random.PRNGKey(7),
                         chunk=16, mesh=None, **kw)
    mesh = make_mesh(8)
    packed = render_image(
        params, jnp.asarray(rays), jax.random.PRNGKey(7), chunk=16,
        mesh=mesh, use_fused=True, fused_channel_io=True, **kw,
    )
    for k in plain:
        np.testing.assert_allclose(
            np.asarray(plain[k]), np.asarray(packed[k]), rtol=5e-4, atol=5e-4
        )


def test_plan_chunks_economy():
    """Regression: a huge default --chunk on a tiny image must not inflate
    the padded render (256x waste once aborted 8-device CPU validation via
    the XLA collective-rendezvous watchdog)."""
    from nerf_pl_tpu.tools.render import plan_chunks

    # tiny 8x8 val image, default eval chunk, 8 devices
    chunk, n_chunks, n_pad = plan_chunks(64, 32 * 1024, 8)
    total = n_chunks * chunk
    assert n_chunks % 8 == 0
    assert total >= 64
    assert total <= 8 * 8  # exactly one device-share chunk each, no bloat
    # large image: chunk stays at the requested bound
    chunk, n_chunks, n_pad = plan_chunks(800 * 800, 32 * 1024, 8)
    assert chunk == 32 * 1024
    assert n_chunks % 8 == 0 and n_chunks * chunk >= 800 * 800
    assert n_pad < 8 * chunk
    # single device, non-divisible
    chunk, n_chunks, n_pad = plan_chunks(100, 32, 1)
    assert chunk == 32 and n_chunks == 4 and n_pad == 28
