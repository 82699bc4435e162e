import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.ops.sampling import (
    perturb_z_vals,
    sample_pdf,
    sample_pdf_bins,
    stratified_z_vals,
)
from nerf_pl_tpu.ops.searchsorted import searchsorted_jnp, searchsorted_pallas


def _random_cdf(rng, b, m):
    w = rng.rand(b, m - 1).astype(np.float32) + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    return np.concatenate([np.zeros((b, 1), np.float32), cdf], -1)


def test_searchsorted_jnp_vs_numpy():
    rng = np.random.RandomState(0)
    cdf = _random_cdf(rng, 64, 65)
    u = rng.rand(64, 33).astype(np.float32)
    for side in ("left", "right"):
        got = np.asarray(searchsorted_jnp(jnp.asarray(cdf), jnp.asarray(u), side))
        want = np.stack(
            [np.searchsorted(cdf[i], u[i], side=side) for i in range(64)]
        )
        np.testing.assert_array_equal(got, want)


def test_searchsorted_pallas_interpret_matches():
    """Pallas kernel (interpreter mode on CPU) vs the jnp reference."""
    from jax.experimental import pallas as pl

    rng = np.random.RandomState(1)
    cdf = _random_cdf(rng, 300, 63)  # non-multiple of block to test padding
    u = rng.rand(300, 128).astype(np.float32)
    # run the PRODUCTION wrapper (launch config included) in interpret mode
    out = searchsorted_pallas(
        jnp.asarray(cdf), jnp.asarray(u), "right", block_b=128,
        interpret=True,
    )
    want = np.asarray(searchsorted_jnp(jnp.asarray(cdf), jnp.asarray(u), "right"))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_searchsorted_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    cdf = _random_cdf(rng, 41, 17)
    u = rng.rand(41, 9).astype(np.float32)
    got = np.asarray(searchsorted_jnp(jnp.asarray(cdf), jnp.asarray(u), "right"))
    want = torch.searchsorted(
        torch.from_numpy(cdf), torch.from_numpy(u), right=True
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_stratified_z_linear_and_disp():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = np.asarray(stratified_z_vals(near, far, 5))
    np.testing.assert_allclose(z[0], [2, 3, 4, 5, 6], rtol=1e-6)
    zd = np.asarray(stratified_z_vals(near, far, 5, use_disp=True))
    want = 1.0 / np.linspace(1 / 2.0, 1 / 6.0, 5)
    np.testing.assert_allclose(zd[0], want, rtol=1e-6)


def test_perturb_z_bounds():
    near = jnp.full((8, 1), 2.0)
    far = jnp.full((8, 1), 6.0)
    z = jnp.broadcast_to(stratified_z_vals(near, far, 16), (8, 16))
    zp = np.asarray(perturb_z_vals(z, 1.0, key=jax.random.PRNGKey(0)))
    z = np.asarray(z)
    mid = 0.5 * (z[:, :-1] + z[:, 1:])
    upper = np.concatenate([mid, z[:, -1:]], -1)
    lower = np.concatenate([z[:, :1], mid], -1)
    assert (zp >= lower - 1e-6).all() and (zp <= upper + 1e-6).all()
    # monotone non-decreasing per ray
    assert (np.diff(zp, axis=-1) >= -1e-6).all()


def naive_sample_pdf(rays, weights, n_imp, u, jitter, eps=1e-5):
    """Loop re-implementation of the fork's sampler contract
    (models/rendering.py:29-48)."""
    b, m = weights.shape
    out = np.zeros((b, n_imp), np.float32)
    for i in range(b):
        w = weights[i] + eps
        pdf = w / w.sum()
        cdf = np.concatenate([[0.0], np.cumsum(pdf)])
        inds = np.searchsorted(cdf, u[i], side="right").astype(np.float32) - 1
        inds = np.maximum(inds, 0)
        z_steps = (inds + jitter[i]) / m
        near, far = rays[i, -2], rays[i, -1]
        out[i] = near * (1 - z_steps) + far * z_steps
    return out


def test_sample_pdf_matches_naive_with_injected_u():
    rng = np.random.RandomState(3)
    b, m, n_imp = 16, 62, 24
    weights = rng.rand(b, m).astype(np.float32)
    u = rng.rand(b, n_imp).astype(np.float32)
    jit_ = rng.rand(b, n_imp).astype(np.float32)
    rays = np.zeros((b, 8), np.float32)
    rays[:, 6], rays[:, 7] = 2.0, 6.0
    got = np.asarray(
        sample_pdf(jnp.asarray(rays), jnp.asarray(weights), n_imp,
                   u=jnp.asarray(u), jitter=jnp.asarray(jit_))
    )
    want = naive_sample_pdf(rays, weights, n_imp, u, jit_)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert (got >= 2.0 - 1e-5).all() and (got <= 6.0 + 1e-5).all()


def test_sample_pdf_det_mode():
    rng = np.random.RandomState(4)
    weights = rng.rand(4, 30).astype(np.float32)
    rays = np.zeros((4, 8), np.float32)
    rays[:, 6], rays[:, 7] = 1.0, 5.0
    a = sample_pdf(jnp.asarray(rays), jnp.asarray(weights), 8, det=True)
    b = sample_pdf(jnp.asarray(rays), jnp.asarray(weights), 8, det=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_pdf_bins_importance_concentration():
    """Mass concentrated in one bin -> most samples land in that bin."""
    b, m = 8, 32
    weights = np.full((b, m), 1e-4, np.float32)
    weights[:, 10] = 10.0
    bins = np.broadcast_to(
        np.linspace(0, 1, m + 1, dtype=np.float32), (b, m + 1)
    ).copy()
    z = np.asarray(
        sample_pdf_bins(
            jnp.asarray(bins), jnp.asarray(weights), 64,
            key=jax.random.PRNGKey(0),
        )
    )
    lo, hi = bins[0, 10], bins[0, 11]
    frac = ((z >= lo) & (z <= hi)).mean()
    assert frac > 0.9


def test_sample_pdf_det_stays_within_near_far():
    """Regression: the det-linspace endpoint u=1.0 must not index past the
    cdf and produce a fine sample beyond ``far`` (outside the frustum)."""
    import jax.numpy as jnp

    from nerf_pl_tpu.ops.sampling import sample_pdf

    n_rays, n_s = 4, 8
    rays = jnp.concatenate(
        [jnp.zeros((n_rays, 6)), jnp.full((n_rays, 1), 2.0),
         jnp.full((n_rays, 1), 6.0)], axis=1
    )
    weights = jnp.ones((n_rays, n_s))
    z = sample_pdf(rays, weights, 16, det=True)
    assert float(z.max()) <= 6.0 + 1e-6
    assert float(z.min()) >= 2.0 - 1e-6


def test_sample_pdf_det_interpolates_within_bins():
    """det (eval) sampling must be CONTINUOUS: in this sampler the inds are
    integers, so all sub-bin resolution comes from the offset. A fixed det
    offset collapses every fine sample onto the coarse bin-midpoint lattice
    (measured -3.6 dB at eval, docs/results.md); in-bin inverse-CDF
    interpolation keeps det deterministic AND spread."""
    b, m, n_imp = 4, 16, 32
    # all mass in one bin -> every sample lands there, and must SPREAD
    weights = np.full((b, m), 1e-6, np.float32)
    weights[:, 5] = 1.0
    rays = np.zeros((b, 8), np.float32)
    rays[:, 6], rays[:, 7] = 2.0, 6.0
    z = np.asarray(sample_pdf(jnp.asarray(rays), jnp.asarray(weights),
                              n_imp, det=True))
    width = (6.0 - 2.0) / m
    lo, hi = 2.0 + 5 * width, 2.0 + 6 * width
    inside = ((z >= lo - 1e-4) & (z <= hi + 1e-4)).mean()
    assert inside > 0.9
    # continuous: essentially every sample distinct (not a midpoint lattice)
    assert len(np.unique(np.round(z[0], 6))) >= n_imp - 2
    # deterministic and monotone in u
    z2 = np.asarray(sample_pdf(jnp.asarray(rays), jnp.asarray(weights),
                               n_imp, det=True))
    np.testing.assert_array_equal(z, z2)
    assert (np.diff(z[0]) >= -1e-6).all()


def test_searchsorted_interp_matches_gather_formulation():
    """The gather-free rank+endpoints op (``searchsorted_interp`` — jnp AND
    Pallas-interpret) must reproduce the explicit cdf[ind]/cdf[ind+1]
    gathers it replaced, including the u=0 / u=1 endpoints and u exactly on
    a cdf knot."""
    from nerf_pl_tpu.ops.searchsorted import (
        searchsorted_interp_jnp,
        searchsorted_interp_pallas,
        searchsorted_jnp,
    )

    rng = np.random.RandomState(3)
    B, M, K = 16, 65, 128
    w = rng.rand(B, M - 1).astype(np.float32) + 1e-3
    cdf = np.cumsum(w / w.sum(1, keepdims=True), axis=1)
    cdf = np.concatenate([np.zeros((B, 1), np.float32), cdf], 1)
    u = rng.rand(B, K).astype(np.float32)
    u[:, 0], u[:, 1] = 0.0, 1.0
    u[:, 2] = cdf[:, 7]  # exactly on a knot
    cdf_j, u_j = jnp.asarray(cdf), jnp.asarray(u)

    ranks_ref = np.asarray(searchsorted_jnp(cdf_j, u_j))
    ind = np.clip(ranks_ref - 1, 0, M - 2)  # production clip (cdf has M cols)
    rows = np.arange(B)[:, None]
    lo_ref = cdf[rows, ind]
    hi_ref = cdf[rows, ind + 1]

    for fn in (
        searchsorted_interp_jnp,
        lambda c, v: searchsorted_interp_pallas(c, v, interpret=True),
    ):
        ranks, lo, hi = (np.asarray(a) for a in fn(cdf_j, u_j))
        np.testing.assert_array_equal(ranks, ranks_ref)
        np.testing.assert_allclose(lo, lo_ref, rtol=0, atol=1e-7)
        np.testing.assert_allclose(hi, hi_ref, rtol=0, atol=1e-7)
