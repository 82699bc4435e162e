import numpy as np
import jax.numpy as jnp

from nerf_pl_tpu.models.embedding import Embedding, posenc


def naive_posenc(x, n_freqs, logscale=True):
    """Independent loop implementation of the reference contract
    (models/nerf.py:21-38): [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]."""
    if logscale:
        freqs = 2.0 ** np.linspace(0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1, 2 ** (n_freqs - 1), n_freqs)
    cols = [x]
    for f in freqs:
        cols.append(np.sin(f * x))
        cols.append(np.cos(f * x))
    return np.concatenate(cols, axis=-1)


def test_posenc_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(17, 3).astype(np.float32)
    for nf in (4, 10):
        got = np.asarray(posenc(jnp.asarray(x), nf))
        want = naive_posenc(x, nf)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_posenc_linear_freqs():
    rng = np.random.RandomState(1)
    x = rng.randn(5, 3).astype(np.float32)
    got = np.asarray(posenc(jnp.asarray(x), 4, logscale=False))
    want = naive_posenc(x, 4, logscale=False)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_embedding_channels():
    assert Embedding(3, 10).out_channels == 63
    assert Embedding(3, 4).out_channels == 27
    e = Embedding(3, 10)
    assert e(jnp.ones((7, 3))).shape == (7, 63)
