import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.training.losses import loss_dict, mse_loss, opacity_loss, sm_loss
from nerf_pl_tpu.training.metrics import mse, psnr, ssim


def test_mse_loss_coarse_plus_fine():
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    rc = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    rf = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    got = float(mse_loss({"rgb_coarse": rc, "rgb_fine": rf}, t))
    want = float(jnp.mean((rc - t) ** 2) + jnp.mean((rf - t) ** 2))
    assert got == pytest.approx(want, rel=1e-6)
    got_c = float(mse_loss({"rgb_coarse": rc}, t))
    assert got_c == pytest.approx(float(jnp.mean((rc - t) ** 2)), rel=1e-6)


def test_sm_loss_uses_sm_keys():
    t = jnp.ones((4, 3))
    r = {"sm_coarse": jnp.zeros((4, 3)), "sm_fine": jnp.ones((4, 3))}
    assert float(sm_loss(r, t)) == pytest.approx(1.0)


def test_opacity_loss_structure():
    # half shadow / half lit
    t = jnp.concatenate([jnp.ones((5, 3)), jnp.zeros((5, 3))])
    op = jnp.concatenate([jnp.full((5,), 0.9), jnp.full((5,), 0.1)])
    r = {"opacity_coarse": op}
    got = float(opacity_loss(r, t, coeff=2000.0))
    # coeff - |mean(non_sm) - mean(sm)| = 2000 - |0.1 - 0.9|
    assert got == pytest.approx(2000.0 - 0.8, rel=1e-5)
    # all-shadow targets -> zero (reference early-return, losses.py:52,60)
    got0 = float(opacity_loss(r, jnp.ones((10, 3)), coeff=2000.0))
    assert got0 == 0.0


def test_loss_dict_keys():
    assert set(loss_dict) == {"mse", "sm", "opacity"}


def test_psnr_known_value():
    a = jnp.zeros((4, 4))
    b = jnp.full((4, 4), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, rel=1e-4)


def test_mse_valid_mask():
    pred = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
    gt = jnp.zeros((2, 2))
    m = jnp.asarray([[False, True], [True, True]])
    assert float(mse(pred, gt, valid_mask=m)) == 0.0


def test_ssim_identical_is_one_and_matches_torch_style():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-4)
    noisy = img + 0.3 * jnp.asarray(rng.randn(1, 3, 16, 16).astype(np.float32))
    val = float(ssim(img, noisy))
    assert -1.0 <= val < 0.95
