"""Volume-rendering alpha compositing (the NeRF quadrature).

Behavioral contract (reference ``models/rendering.py:169-198`` /
``models/rendering_shadows.py:172-203``):
  * ``deltas = z[i+1] - z[i]`` with a 1e10 tail, scaled by ``||dir||`` per ray.
  * Gaussian sigma noise with std ``noise_std``.
  * ``alpha = 1 - exp(-delta * relu(sigma + noise))``.
  * Transmittance via exclusive cumprod of ``[1, 1-a+1e-10, ...]``.
  * ``rgb = sum w * rgbs`` (+ white-background blend ``rgb += 1 - sum w``),
    ``depth = sum w * z``, ``opacity = sum w``,
    ``disp = 1 / max(1e-10, depth / sum w)`` (sigma-only renderer,
    ``models/rendering_shadows.py:198``).

This is pure VPU elementwise work; XLA fuses the entire chain with the MLP
epilogue, so no Pallas kernel is needed — the cumprod lowers to an efficient
scan on the 8x128 VPU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def compute_weights(
    sigmas: jnp.ndarray,  # (N_rays, S)
    z_vals: jnp.ndarray,  # (N_rays, S)
    dirs: jnp.ndarray,  # (N_rays, 3) un-normalized allowed
    noise_std: float = 1.0,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-sample compositing weights ``w_i = alpha_i * T_i``."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
    deltas = deltas * jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    if noise is None:
        if noise_std > 0:
            noise = jax.random.normal(key, sigmas.shape, sigmas.dtype) * noise_std
        else:
            noise = jnp.zeros_like(sigmas)

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas + noise))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transmittance = jnp.cumprod(shifted, axis=-1)[:, :-1]
    return alphas * transmittance


def composite(
    weights: jnp.ndarray,  # (N_rays, S)
    z_vals: jnp.ndarray,  # (N_rays, S)
    rgbs: Optional[jnp.ndarray] = None,  # (N_rays, S, 3)
    white_back: bool = False,
):
    """Reduce weights into (rgb, depth, opacity, disp) ray outputs.

    Returns a dict with keys ``depth``, ``opacity``, ``disp`` and — when
    ``rgbs`` is given — ``rgb``.
    """
    opacity = weights.sum(axis=1)
    depth = jnp.sum(weights * z_vals, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / opacity)
    out = {"depth": depth, "opacity": opacity, "disp": disp}
    if rgbs is not None:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
        if white_back:
            rgb = rgb + (1.0 - opacity[..., None])
        out["rgb"] = rgb
    return out
