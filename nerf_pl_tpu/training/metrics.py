"""Image metrics (reference ``metrics.py``).

``mse``/``psnr`` with optional valid-pixel masks; ``ssim`` matches the
reference's kornia usage (``1 - 2*dssim`` with window 3 — i.e. plain SSIM
with a 3x3 gaussian window, sigma 1.5).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(image_pred, image_gt, valid_mask: Optional[jnp.ndarray] = None,
        reduction: str = "mean"):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        if reduction == "mean":
            m = valid_mask.astype(value.dtype)
            # broadcast a per-pixel mask over channels if needed
            while m.ndim < value.ndim:
                m = m[..., None]
            m = jnp.broadcast_to(m, value.shape)
            return (value * m).sum() / jnp.maximum(m.sum(), 1)
        return value[valid_mask]
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr(image_pred, image_gt, valid_mask=None, reduction: str = "mean"):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def _gaussian_kernel(size: int = 3, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    k = k / k.sum()
    return np.outer(k, k).astype(np.float32)


def ssim(image_pred, image_gt, window_size: int = 3, sigma: float = 1.5,
         max_val: float = 1.0):
    """SSIM over (1, C, H, W) images — numerically equivalent to the
    reference's ``1 - 2*dssim(pred, gt, 3, 'mean')`` (``metrics.py:15-19``)
    under its pinned kornia==0.2.0 (requirements.txt:5), whose
    ``losses.ssim``:

      * filters with a gaussian window (sigma 1.5) at ZERO padding
        ``(window_size-1)//2`` (same-size output, borders see zeros);
      * computes the per-pixel dissimilarity as
        ``clamp(1 - ssim_map, 0, 1) / 2`` — the clamp applies BEFORE the
        halving, so dssim saturates at 0.5 for anti-correlated pixels and
        the reference's "in [-1, 1]" comment is aspirational: its ssim
        actually lands in [0, 1].

    Asserted against that formula (as a cited torch shim driving the
    reference's own ``metrics.ssim``) in
    ``tests/test_reference_parity.py::test_ssim_matches_reference``."""
    kern = jnp.asarray(_gaussian_kernel(window_size, sigma))
    c = image_pred.shape[1]
    kern = jnp.broadcast_to(kern[None, None], (c, 1, window_size, window_size))
    pad = (window_size - 1) // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
        )

    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_p, mu_g = filt(image_pred), filt(image_gt)
    mu_pp, mu_gg, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    s_pp = filt(image_pred * image_pred) - mu_pp
    s_gg = filt(image_gt * image_gt) - mu_gg
    s_pg = filt(image_pred * image_gt) - mu_pg
    num = (2 * mu_pg + C1) * (2 * s_pg + C2)
    den = (mu_pp + mu_gg + C1) * (s_pp + s_gg + C2)
    dssim = jnp.clip(1.0 - num / den, 0.0, 1.0) * 0.5
    return 1.0 - 2.0 * jnp.mean(dssim)
