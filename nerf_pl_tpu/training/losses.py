"""Training losses (reference ``losses.py``).

  * ``mse_loss``     — mean-squared error on ``rgb_coarse`` plus ``rgb_fine``
    when present (``losses.py:4-14``).
  * ``sm_loss``      — identical but on the ``sm_coarse``/``sm_fine`` keys
    written by the joint RGB+shadow renderer (``losses.py:16-26``).
  * ``opacity_loss`` — threshold the GT shadow image at ``sm_thres`` into
    shadow / non-shadow pixel sets and penalize
    ``coeff - |mean(non_sm_opacity) - mean(sm_opacity)|`` on coarse (+fine)
    opacities (``losses.py:28-73``).  The reference's dynamic ``torch.where``
    indexing becomes masked means (static shapes for jit); the empty-set
    early-return (``losses.py:52,60``) becomes a ``jnp.where`` guard.
"""
from __future__ import annotations

import jax.numpy as jnp


def mse_loss(results, targets):
    loss = jnp.mean((results["rgb_coarse"] - targets) ** 2)
    if "rgb_fine" in results:
        loss = loss + jnp.mean((results["rgb_fine"] - targets) ** 2)
    return loss


def sm_loss(results, targets):
    loss = jnp.mean((results["sm_coarse"] - targets) ** 2)
    if "sm_fine" in results:
        loss = loss + jnp.mean((results["sm_fine"] - targets) ** 2)
    return loss


def _masked_mean(x, mask):
    cnt = mask.sum()
    return jnp.where(cnt > 0, (x * mask).sum() / jnp.maximum(cnt, 1), 0.0)


def opacity_loss(results, targets, coeff: float = 2000.0, sm_thres: float = 0.4):
    gray = targets.sum(axis=-1) / 3.0
    sm_mask = (gray > sm_thres).astype(targets.dtype)
    non_sm_mask = 1.0 - sm_mask
    any_both = (sm_mask.sum() > 0) & (non_sm_mask.sum() > 0)

    def term(opacity):
        sm_mean = _masked_mean(opacity, sm_mask)
        non_mean = _masked_mean(opacity, non_sm_mask)
        return coeff - jnp.abs(non_mean - sm_mean)

    loss = term(results["opacity_coarse"])
    if "opacity_fine" in results:
        loss = loss + term(results["opacity_fine"])
    return jnp.where(any_both, loss, 0.0)


loss_dict = {"mse": mse_loss, "sm": sm_loss, "opacity": opacity_loss}
