import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.ops.compositing import composite, compute_weights


def naive_weights(sigmas, z, dirs, noise):
    """Loop re-implementation of the compositing contract
    (models/rendering.py:169-189)."""
    b, s = sigmas.shape
    w = np.zeros((b, s), np.float32)
    for i in range(b):
        deltas = np.concatenate([z[i, 1:] - z[i, :-1], [1e10]])
        deltas = deltas * np.linalg.norm(dirs[i])
        a = 1 - np.exp(-deltas * np.maximum(sigmas[i] + noise[i], 0))
        T = 1.0
        for j in range(s):
            w[i, j] = a[j] * T
            T = T * (1 - a[j] + 1e-10)
    return w


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    b, s = 12, 20
    sigmas = rng.randn(b, s).astype(np.float32) * 2
    z = np.sort(rng.rand(b, s).astype(np.float32) * 4 + 2, axis=-1)
    dirs = rng.randn(b, 3).astype(np.float32)
    noise = rng.randn(b, s).astype(np.float32)
    return sigmas, z, dirs, noise


def test_weights_match_naive(data):
    sigmas, z, dirs, noise = data
    got = np.asarray(
        compute_weights(
            jnp.asarray(sigmas), jnp.asarray(z), jnp.asarray(dirs),
            noise_std=1.0, noise=jnp.asarray(noise),
        )
    )
    want = naive_weights(sigmas, z, dirs, noise)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_weights_match_torch_cumprod(data):
    torch = pytest.importorskip("torch")
    sigmas, z, dirs, noise = data
    ts, tz, td, tn = map(torch.from_numpy, (sigmas, z, dirs, noise))
    deltas = torch.cat([tz[:, 1:] - tz[:, :-1], torch.full_like(tz[:, :1], 1e10)], -1)
    deltas = deltas * torch.norm(td.unsqueeze(1), dim=-1)
    alphas = 1 - torch.exp(-deltas * torch.relu(ts + tn))
    shifted = torch.cat([torch.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1)
    want = (alphas * torch.cumprod(shifted, -1)[:, :-1]).numpy()
    got = np.asarray(
        compute_weights(
            jnp.asarray(sigmas), jnp.asarray(z), jnp.asarray(dirs),
            noise_std=1.0, noise=jnp.asarray(noise),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_composite_outputs(data):
    sigmas, z, dirs, noise = data
    rng = np.random.RandomState(1)
    rgbs = rng.rand(12, 20, 3).astype(np.float32)
    w = compute_weights(
        jnp.asarray(sigmas), jnp.asarray(z), jnp.asarray(dirs),
        noise_std=0.0,
    )
    out = composite(w, jnp.asarray(z), jnp.asarray(rgbs), white_back=False)
    wn = np.asarray(w)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), (wn[..., None] * rgbs).sum(1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), (wn * z).sum(1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out["opacity"]), wn.sum(1), rtol=1e-5)
    # white background adds (1 - opacity)
    out_w = composite(w, jnp.asarray(z), jnp.asarray(rgbs), white_back=True)
    np.testing.assert_allclose(
        np.asarray(out_w["rgb"]),
        np.asarray(out["rgb"]) + (1 - wn.sum(1, keepdims=True)),
        rtol=1e-5, atol=1e-6,
    )
    # disparity definition (models/rendering_shadows.py:198)
    np.testing.assert_allclose(
        np.asarray(out["disp"]),
        1.0 / np.maximum(1e-10, (wn * z).sum(1) / wn.sum(1)),
        rtol=1e-5,
    )


def test_opaque_wall_gets_full_weight():
    """A very dense first sample should absorb everything."""
    sigmas = jnp.asarray([[1e4, 1.0, 1.0]])
    z = jnp.asarray([[2.0, 3.0, 4.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    w = np.asarray(compute_weights(sigmas, z, dirs, noise_std=0.0))
    assert w[0, 0] > 0.999
    assert w[0, 1:].sum() < 1e-3
