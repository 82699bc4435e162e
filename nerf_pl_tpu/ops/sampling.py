"""Depth sampling along rays: stratified coarse samples, perturbation, and
inverse-CDF importance sampling.

Behavioral contracts:
  * ``stratified_z_vals`` — linear in depth or disparity over [near, far]
    (reference ``models/rendering.py:216-223``).
  * ``perturb_z_vals`` — jitter inside per-interval bins bounded by midpoints
    (reference ``models/rendering.py:225-232``).
  * ``sample_pdf`` — the fork's pixel-nerf style sampler (reference
    ``models/rendering.py:14-48``): build a zero-padded CDF from
    ``weights + eps``, draw ``u ~ U(0,1)``, take
    ``inds = searchsorted(cdf, u, 'right') - 1`` clamped at 0, jitter to
    ``z_steps = (inds + rand)/N_samples_`` and lerp between near and far.
    NOTE the reference accepts ``det`` but ignores it
    (``models/rendering.py:51-55`` is commented out); we honor ``det`` (a
    documented fix, see SURVEY.md §7) with a linspace for ``u`` and, in place
    of the random jitter, the exact inverse-CDF position of each ``u`` within
    its CDF bin (``offset = (u - cdf_lo)/(cdf_hi - cdf_lo)``) — deterministic
    AND continuous; a fixed midpoint offset collapsed fine samples onto the
    coarse lattice (measured -3.6 dB, docs/results.md).
  * ``sample_pdf_bins`` — the classical upstream bin-interpolation variant
    (kept behind a flag; reference has it commented at
    ``models/rendering.py:51-81``).

All functions take explicit PRNG keys (or injected uniforms for torch-parity
tests) — no hidden state.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .searchsorted import searchsorted, searchsorted_interp


def stratified_z_vals(
    near: jnp.ndarray,  # (N_rays, 1)
    far: jnp.ndarray,  # (N_rays, 1)
    N_samples: int,
    use_disp: bool = False,
) -> jnp.ndarray:
    """(N_rays, N_samples) linearly spaced depths (or disparities)."""
    z_steps = jnp.linspace(0.0, 1.0, N_samples, dtype=near.dtype)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    return z_vals


def perturb_z_vals(
    z_vals: jnp.ndarray,
    perturb: float,
    key: Optional[jax.Array] = None,
    rand: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Jitter each sample uniformly within its midpoint-bounded interval."""
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
    if rand is None:
        rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * perturb * rand


def sample_pdf(
    rays: jnp.ndarray,  # (N_rays, 8): [...,-2:] = near, far
    weights: jnp.ndarray,  # (N_rays, N_samples_)
    N_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
    u: Optional[jnp.ndarray] = None,
    jitter: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fork-parity inverse-CDF sampler. Returns (N_rays, N_importance) depths.

    ``u``/``jitter`` may be injected for torch-parity testing; otherwise they
    are drawn from ``key``.
    """
    N_rays, N_samples_ = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    needs_rng = not det and (u is None or jitter is None)
    if needs_rng:
        if key is None:
            raise ValueError("sample_pdf needs a PRNG key when u/jitter not given")
        ku, kj = jax.random.split(key)
    if u is None:
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, N_importance, dtype=weights.dtype),
                (N_rays, N_importance),
            )
        else:
            u = jax.random.uniform(ku, (N_rays, N_importance), dtype=weights.dtype)

    if det and jitter is None:
        # In this sampler the inds are INTEGERS — all sub-bin resolution
        # comes from the offset (z_steps = (inds+offset)/N).  A fixed det
        # offset (e.g. 0.5) collapses every fine sample onto the coarse
        # bin-midpoint lattice, measured -3.6 dB at eval vs the random
        # sampler (docs/results.md).  Interpolating u's position within its
        # cdf bin keeps det sampling deterministic AND continuous — the
        # exact inverse-CDF transform of the linspace u.
        # GATHER-FREE: rank and both bin endpoints come from one masked
        # compare-reduce pass (``searchsorted_interp``) — per-draw gathers
        # of cdf[ind]/cdf[ind+1] measured 65 ms per 32768-ray eval chunk on
        # TPU (164k -> 246k rays/s whole-image, docs/results.md round 3)
        ranks, lo, hi = searchsorted_interp(cdf, u)
        inds = jnp.clip(ranks - 1, 0, N_samples_ - 1).astype(weights.dtype)
        offset = jnp.clip((u - lo) / jnp.maximum(hi - lo, eps), 0.0, 1.0)
        z_steps = (inds + offset) / N_samples_
        near, far = rays[:, -2:-1], rays[:, -1:]
        return near * (1.0 - z_steps) + far * z_steps

    inds_i = jnp.clip(
        searchsorted(cdf, u, side="right").astype(jnp.int32) - 1,
        0, N_samples_ - 1,
    )
    # clamp both ends: u=1.0 (the det-linspace endpoint) lands past the last
    # cdf entry and would otherwise yield z_steps > 1, i.e. a sample beyond
    # ``far`` (outside the frustum; past z=1 for NDC rays)
    inds = inds_i.astype(weights.dtype)

    if jitter is not None:
        offset = jitter  # injected (torch-parity) — honored in det mode too
    else:
        offset = jax.random.uniform(
            kj, (N_rays, N_importance), dtype=weights.dtype
        )
    z_steps = (inds + offset) / N_samples_

    near, far = rays[:, -2:-1], rays[:, -1:]
    return near * (1.0 - z_steps) + far * z_steps


def sample_pdf_bins(
    bins: jnp.ndarray,  # (N_rays, N_samples_+1) bin edges (z midpoints)
    weights: jnp.ndarray,  # (N_rays, N_samples_)
    N_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
    u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Classical upstream variant: piecewise-linear inverse CDF over bins."""
    N_rays, N_samples_ = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    if u is None:
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, N_importance, dtype=weights.dtype),
                (N_rays, N_importance),
            )
        else:
            u = jax.random.uniform(key, (N_rays, N_importance), dtype=weights.dtype)

    inds = searchsorted(cdf, u, side="right")
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, N_samples_)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)
