import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.models.nerf import init_nerf, nerf_apply, num_params


def test_shapes_and_param_count():
    p = init_nerf(jax.random.PRNGKey(0))
    x = jnp.ones((5, 63 + 27))
    out = nerf_apply(p, x)
    assert out.shape == (5, 4)
    sig = nerf_apply(p, jnp.ones((5, 63)), sigma_only=True)
    assert sig.shape == (5, 1)
    # ~595k params per MLP: coarse+fine = ~4.8 MB, the reference's "~5 MB
    # portable scene" (README.md:184)
    assert 550_000 < num_params(p) < 650_000


def test_sigma_consistent_between_paths():
    p = init_nerf(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    xyz = jax.random.normal(key, (9, 63))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (9, 27))
    full = nerf_apply(p, jnp.concatenate([xyz, dirs], -1))
    sig = nerf_apply(p, xyz, sigma_only=True)
    np.testing.assert_allclose(np.asarray(full[:, 3:]), np.asarray(sig), rtol=1e-5, atol=1e-5)


def test_rgb_in_unit_interval_sigma_unbounded():
    p = init_nerf(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (100, 90)) * 3
    out = np.asarray(nerf_apply(p, x))
    assert (out[:, :3] >= 0).all() and (out[:, :3] <= 1).all()


def test_torch_parity():
    """Load identical weights into a torch functional replica of the reference
    MLP (models/nerf.py:41-123 contract) and compare outputs."""
    torch = pytest.importorskip("torch")
    p = init_nerf(jax.random.PRNGKey(5))

    def tt(a):
        return torch.from_numpy(np.asarray(a))

    def torch_forward(x, sigma_only=False):
        xyz = x[:, :63] if not sigma_only else x
        h = xyz
        for i, layer in enumerate(p["xyz_layers"]):
            if i == 4:
                h = torch.cat([xyz, h], dim=-1)
            h = torch.relu(h @ tt(layer["w"]) + tt(layer["b"]))
        sigma = h @ tt(p["sigma"]["w"]) + tt(p["sigma"]["b"])
        if sigma_only:
            return sigma
        final = h @ tt(p["xyz_final"]["w"]) + tt(p["xyz_final"]["b"])
        d = torch.cat([final, x[:, 63:]], dim=-1)
        d = torch.relu(d @ tt(p["dir_layer"]["w"]) + tt(p["dir_layer"]["b"]))
        rgb = torch.sigmoid(d @ tt(p["rgb"]["w"]) + tt(p["rgb"]["b"]))
        return torch.cat([rgb, sigma], dim=-1)

    x = np.random.RandomState(0).randn(33, 90).astype(np.float32)
    want = torch_forward(torch.from_numpy(x)).numpy()
    got = np.asarray(nerf_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    want_s = torch_forward(torch.from_numpy(x[:, :63]), sigma_only=True).numpy()
    got_s = np.asarray(nerf_apply(p, jnp.asarray(x[:, :63]), sigma_only=True))
    np.testing.assert_allclose(got_s, want_s, rtol=2e-5, atol=2e-5)
