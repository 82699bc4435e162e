"""Independent anchors for the SSIM parity chain (VERDICT r4 weak #3).

The parity suite verifies our ``metrics.ssim`` against the reference's
``metrics.py`` driven through the hand-ported kornia-0.2.0 shim in
``reference_harness.py`` — circular if the port itself misreads kornia.
Pin-installing or vendoring kornia is impossible here (zero egress, no
wheel on disk), so this module triangulates the shim against two anchors
that share NO code with it:

1. a from-the-paper numpy/scipy SSIM (Wang et al. 2004, TIP 13(4):600-612,
   eqs. 13-16) with kornia's documented parameters — gaussian window
   sigma 1.5, zero-padded 'same' filtering, K1=0.01/K2=0.03 — built on
   ``scipy.signal.convolve2d`` instead of torch convs;
2. closed-form oracles where the formula collapses analytically
   (identical images; constant images with a mean offset — interior
   pixels see zero variances, so
   ssim = (2*m1*m2 + C1) / (m1^2 + m2^2 + C1) exactly).

A port bug would have to be reproduced independently in structure-
different code AND match the closed forms to slip through.  The verbatim-
vendor + content-hash step remains environment-blocked and is documented
in the shim's provenance caveat (reference_harness.py).
"""
import numpy as np
import pytest
from scipy.signal import convolve2d

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from reference_harness import load_reference
from nerf_pl_tpu.training.metrics import ssim as our_ssim

WS, SIGMA = 3, 1.5
K1, K2 = 0.01, 0.03


def _gauss2d(ws=WS, sigma=SIGMA):
    # kornia 0.2.0's documented window: 1-D gaussian at integer offsets
    # from the center, normalized, outer product
    x = np.arange(ws, dtype=np.float64) - (ws - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def ssim_paper(img1, img2, ws=WS, max_val=1.0):
    """Wang et al. 2004 eq. 13 with gaussian weighting (section III.B),
    per channel, zero-padded 'same' filtering.  (B, C, H, W) -> map."""
    k = _gauss2d(ws)
    C1, C2 = (K1 * max_val) ** 2, (K2 * max_val) ** 2

    def filt(x):  # (H, W) zero-padded weighted local mean
        return convolve2d(x, k, mode="same", boundary="fill", fillvalue=0.0)

    out = np.empty_like(img1, dtype=np.float64)
    b, c, _, _ = img1.shape
    for i in range(b):
        for j in range(c):
            x, y = img1[i, j].astype(np.float64), img2[i, j].astype(np.float64)
            mx, my = filt(x), filt(y)
            vx = filt(x * x) - mx * mx
            vy = filt(y * y) - my * my
            vxy = filt(x * y) - mx * my
            out[i, j] = ((2 * mx * my + C1) * (2 * vxy + C2)) / (
                (mx * mx + my * my + C1) * (vx + vy + C2)
            )
    return out


def _rand_pair(shape=(2, 3, 17, 23), seed=0):
    rng = np.random.RandomState(seed)
    a = rng.rand(*shape).astype(np.float32)
    b = np.clip(a + 0.15 * rng.randn(*shape).astype(np.float32), 0, 1)
    return a, b


@pytest.mark.parametrize("ws", [3, 11])
def test_shim_matches_independent_paper_implementation(ws):
    """The torch kornia-port and the scipy from-the-paper build must agree
    per pixel (including the zero-padded borders) for the reference's
    window 3 and the conventional window 11."""
    load_reference()
    import kornia.losses as kl  # the installed shim

    a, b = _rand_pair()
    # float64 through the shim: the comparison is about FORMULA agreement,
    # not float32 conv round-off
    shim = kl.ssim(torch.from_numpy(a.astype(np.float64)),
                   torch.from_numpy(b.astype(np.float64)), ws,
                   reduction="none").numpy()
    paper = ssim_paper(a, b, ws)
    expect = np.clip(1.0 - paper, 0.0, 1.0) / 2.0  # kornia's dssim map
    # the shim constructs its window in float32 (kornia does too), which
    # bounds agreement at ~2e-6; a structural misreading (padding mode,
    # kernel normalization, clamp order) would diverge by >=1e-2
    np.testing.assert_allclose(shim, expect, rtol=1e-5, atol=1e-7)


def test_our_ssim_matches_independent_paper_implementation():
    """OUR jax metric against the scipy anchor directly — no torch, no
    shim, no reference code anywhere in this comparison."""
    a, b = _rand_pair(seed=3)
    got = np.asarray(our_ssim(jnp.asarray(a), jnp.asarray(b)))
    paper = ssim_paper(a, b, WS)
    # metrics.ssim reproduces the reference chain: 1 - 2*mean(dssim)
    expect = 1.0 - 2.0 * np.mean(np.clip(1.0 - paper, 0.0, 1.0) / 2.0)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_closed_form_oracles():
    """Cases where SSIM collapses analytically pin the constants and the
    formula independent of ANY implementation."""
    load_reference()
    import kornia.losses as kl

    # identical images: ssim == 1 everywhere -> dssim == 0, ours == 1
    a = _rand_pair(seed=5)[0]
    z = kl.ssim(torch.from_numpy(a), torch.from_numpy(a), WS,
                reduction="none").numpy()
    np.testing.assert_allclose(z, 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(our_ssim(jnp.asarray(a), jnp.asarray(a))), 1.0, atol=1e-6
    )

    # constant images with a mean offset: all variances vanish, so
    # interior pixels are exactly (2*m1*m2 + C1) / (m1^2 + m2^2 + C1)
    m1, m2 = 0.4, 0.7
    x = np.full((1, 1, 9, 9), m1, np.float64)
    y = np.full((1, 1, 9, 9), m2, np.float64)
    C1 = K1 ** 2
    expect_ssim = (2 * m1 * m2 + C1) / (m1 * m1 + m2 * m2 + C1)
    got = kl.ssim(torch.from_numpy(x), torch.from_numpy(y), WS,
                  reduction="none").numpy()
    interior = got[0, 0, 1:-1, 1:-1]
    # the float32 window's sum is 1 +/- 1e-8, so the analytically-zero
    # variances cancel only to ~1e-8*m^2 against C2 = 9e-4 -> ~1e-5 rel
    np.testing.assert_allclose(
        interior, (1 - expect_ssim) / 2, rtol=1e-4
    )
