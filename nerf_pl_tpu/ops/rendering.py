"""The coarse→fine volume renderer.

One jittable function covers the reference's three renderer files:
  * ``mode='rgb'``      — reference ``models/rendering.py:84-272`` (keys
    ``rgb_/depth_/opacity_{coarse,fine}``; ``test_time`` skips coarse rgb and
    returns only ``opacity_coarse`` for the coarse model).
  * ``mode='sigma'``    — reference ``models/rendering_shadows.py:94-281``
    (sigma-only MLP queries; keys ``depth_/opacity_/disp_map_{coarse,fine}``).
  * ``mode='rgb_disp'`` — reference ``models/rendering_rgb_sm.py:87-480``
    (rgb keys plus ``disp_map_*``; the shadow-map keys ``sm_*`` are added by
    ``ops.shadow_mapping.efficient_sm`` on top of this renderer's output).

TPU-first design notes (vs the reference's chunked torch loops):
  * No chunk loop — the whole (N_rays, S) batch is one traced computation;
    XLA tiles the (N_rays*S, 256) matmuls onto the MXU.  Whole-image eval
    wraps THIS function in a ``lax.map`` over fixed-size ray chunks instead
    (see ``tools/eval.py``).
  * Fine-pass z-samples come from the Pallas ``searchsorted`` importance
    sampler with a ``stop_gradient`` exactly where the reference ``.detach()``
    is (``models/rendering.py:253-255``).
  * All randomness is explicit: a single PRNG key is split per consumer, and
    every random draw can be overridden via ``overrides`` for torch-parity
    tests (u/jitter/noise/perturb injection, SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.embedding import posenc
from ..models.nerf import nerf_apply
from .compositing import composite, compute_weights
from .fused_mlp import (
    RAW_COLS,
    fused_nerf_apply,
    fused_nerf_apply_raw,
    fused_nerf_apply_raw_t,
    supports_fused,
    supports_fused_wide,
    wide_block_for,
)
from .sampling import perturb_z_vals, sample_pdf, stratified_z_vals

Results = Dict[str, jnp.ndarray]


def _query(
    params,
    xyz: jnp.ndarray,  # (N_rays, S, 3)
    dirs: Optional[jnp.ndarray],  # (N_rays, 3) RAW dirs, None for sigma-only
    xyz_freqs: int,
    sigma_only: bool,
    compute_dtype,
    use_fused: bool = False,
    dir_freqs: int = 4,
    fused_channel_io: bool = False,
    fused_wide_infer: bool = False,
):
    """Embed positions and run the MLP on the flattened point batch.

    ``use_fused`` routes through the raw-input Pallas fused-MLP kernel
    (``ops.fused_mlp`` — whole MLP + positional encoding in VMEM; the XLA
    path is HBM-bound on inter-layer activations); only valid for the
    reference architecture and on TPU backends.  ``fused_channel_io``
    additionally feeds/reads the kernel in channel-major (8, P) layout —
    the (P, small) arrays at the kernel boundary are lane-padded 16x by TPU
    tiling, so the packed layout cuts ray-IO HBM traffic 16x (the
    transposes fuse into the XLA producers/consumers on either side).
    """
    N_rays, S, _ = xyz.shape
    xyz_flat = xyz.reshape(-1, 3)
    # the fused kernel hardcodes the reference embedding (10 xyz / 4 dir);
    # sigma-only queries never consume dirs, so dir_freqs doesn't gate them
    fused = (use_fused and supports_fused(params) and xyz_freqs == 10
             and (sigma_only or dir_freqs == 4))
    # --arch_width wide trunks: the resident-weights kernel still fits VMEM
    # up to W=640, but its remat backward does not — so the wide fused path
    # is opt-in for KNOWN-forward-only callers (eval/serving, tools/render)
    # via ``fused_wide_infer``; training at wide widths stays on XLA
    wide = (use_fused and fused_wide_infer and not fused
            and xyz_freqs == 10 and (sigma_only or dir_freqs == 4)
            and supports_fused_wide(params, compute_dtype))
    if wide:
        w_ = params["xyz_layers"][0]["w"].shape[1]
        x_emb = posenc(xyz_flat, xyz_freqs)
        if not sigma_only:
            dir_emb = posenc(dirs, dir_freqs)
            dir_emb = jnp.broadcast_to(
                dir_emb[:, None, :], (N_rays, S, dir_emb.shape[-1])
            ).reshape(N_rays * S, -1)
            x_emb = jnp.concatenate([x_emb, dir_emb], axis=-1)
        out = fused_nerf_apply(
            params, x_emb, sigma_only=sigma_only,
            compute_dtype=compute_dtype, block=wide_block_for(w_, compute_dtype),
        )
        if sigma_only:
            return out.reshape(N_rays, S), None
        out = out.reshape(N_rays, S, 4)
        return out[..., 3], out[..., :3]
    if fused and fused_channel_io:
        P = N_rays * S
        xyz_t = jnp.moveaxis(xyz, -1, 0).reshape(3, P)
        if sigma_only:
            rest = jnp.zeros((RAW_COLS - 3, P), xyz_t.dtype)
        else:
            dirs_t = jnp.broadcast_to(
                dirs.T[:, :, None], (3, N_rays, S)
            ).reshape(3, P)
            rest = jnp.concatenate(
                [dirs_t, jnp.zeros((RAW_COLS - 6, P), xyz_t.dtype)], axis=0
            )
        x_t = jnp.concatenate([xyz_t, rest], axis=0)
        outT = fused_nerf_apply_raw_t(
            params, x_t, sigma_only=sigma_only, compute_dtype=compute_dtype
        )
        if sigma_only:
            return outT[0].reshape(N_rays, S), None
        sigmas = outT[3].reshape(N_rays, S)
        rgbs = jnp.moveaxis(outT[:3].reshape(3, N_rays, S), 0, -1)
        return sigmas, rgbs
    if sigma_only:
        if fused:
            out = fused_nerf_apply_raw(
                params, xyz_flat, None, compute_dtype=compute_dtype
            )
        else:
            out = nerf_apply(
                params, posenc(xyz_flat, xyz_freqs), sigma_only=True,
                compute_dtype=compute_dtype,
            )
        return out.reshape(N_rays, S), None
    if fused:
        dirs_pt = jnp.broadcast_to(
            dirs[:, None, :], (N_rays, S, 3)
        ).reshape(-1, 3)
        out = fused_nerf_apply_raw(
            params, xyz_flat, dirs_pt, compute_dtype=compute_dtype
        )
    else:
        # embed per ray THEN broadcast (256x fewer transcendentals)
        dir_emb = posenc(dirs, dir_freqs)
        dir_emb = jnp.broadcast_to(
            dir_emb[:, None, :], (N_rays, S, dir_emb.shape[-1])
        ).reshape(N_rays * S, -1)
        x = jnp.concatenate([posenc(xyz_flat, xyz_freqs), dir_emb], axis=-1)
        out = nerf_apply(params, x, sigma_only=False, compute_dtype=compute_dtype)
    out = out.reshape(N_rays, S, 4)
    return out[..., 3], out[..., :3]  # sigmas (N,S), rgbs (N,S,3)


def render_rays(
    params_coarse,
    params_fine,
    rays: jnp.ndarray,  # (N_rays, 8) = [o, d, near, far]
    key: Optional[jax.Array],
    *,
    N_samples: int = 64,
    use_disp: bool = False,
    perturb: float = 0.0,
    noise_std: float = 1.0,
    N_importance: int = 0,
    white_back: bool = False,
    test_time: bool = False,
    mode: str = "rgb",
    xyz_freqs: int = 10,
    dir_freqs: int = 4,
    compute_dtype=jnp.float32,
    use_fused: bool = False,
    fused_channel_io: bool = False,
    fused_wide_infer: bool = False,
    remat_fine: bool = False,
    overrides: Optional[Dict[str, jnp.ndarray]] = None,
) -> Results:
    """Render a batch of rays coarse(+fine). See module docstring for modes."""
    assert mode in ("rgb", "sigma", "rgb_disp"), mode
    ov = overrides or {}
    sigma_mode = mode == "sigma"
    want_disp = mode in ("sigma", "rgb_disp")

    N_rays = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    if key is not None:
        k_perturb, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    else:
        k_perturb = k_noise_c = k_pdf = k_noise_f = None
        needs_rng = (
            (perturb > 0 and "perturb_rand" not in ov)
            or (noise_std > 0 and "noise_coarse" not in ov)
            # sample_pdf draws BOTH u and jitter unless det (perturb == 0)
            or (
                N_importance > 0
                and perturb > 0
                and ("u" not in ov or "jitter" not in ov)
            )
            or (N_importance > 0 and noise_std > 0 and "noise_fine" not in ov)
        )
        if needs_rng:
            raise ValueError(
                "render_rays(key=None) requires either deterministic "
                "settings (perturb=0, noise_std=0) or injected overrides "
                "for every random draw"
            )

    # raw dirs flow to _query; embedding happens per-path (fused: in-kernel)
    dirs_for_query = None if sigma_mode else rays_d

    z_vals = stratified_z_vals(near, far, N_samples, use_disp)
    z_vals = jnp.broadcast_to(z_vals, (N_rays, N_samples))
    if perturb > 0:
        z_vals = perturb_z_vals(
            z_vals, perturb, key=k_perturb, rand=ov.get("perturb_rand")
        )

    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    result: Results = {}
    # test_time skips the coarse RGB head ONLY when a fine pass will produce
    # the image (reference rendering.py:237-241; with N_importance=0 that
    # shortcut would leave no rgb at all)
    coarse_sigma_only = sigma_mode or (test_time and N_importance > 0)
    sigmas_c, rgbs_c = _query(
        params_coarse, xyz_coarse, dirs_for_query, xyz_freqs,
        coarse_sigma_only, compute_dtype, use_fused, dir_freqs,
        fused_channel_io, fused_wide_infer,
    )
    weights_coarse = compute_weights(
        sigmas_c, z_vals, rays_d, noise_std, key=k_noise_c,
        noise=ov.get("noise_coarse"),
    )
    if coarse_sigma_only and not sigma_mode:  # test_time w/ a fine pass
        result["opacity_coarse"] = weights_coarse.sum(axis=1)
    else:
        comp = composite(
            weights_coarse, z_vals, rgbs_c, white_back=white_back and not sigma_mode
        )
        result["depth_coarse"] = comp["depth"]
        result["opacity_coarse"] = comp["opacity"]
        if not sigma_mode:
            result["rgb_coarse"] = comp["rgb"]
        if want_disp:
            result["disp_map_coarse"] = comp["disp"]

    if N_importance > 0:
        # det when unperturbed; the reference computes det=(perturb==0) but its
        # sample_pdf ignores it (models/rendering.py:51-55) — honoring det is a
        # documented fix (SURVEY.md §7) that makes eval deterministic.
        z_fine = sample_pdf(
            rays,
            weights_coarse[:, 1:-1],
            N_importance,
            det=(perturb == 0),
            key=k_pdf,
            u=ov.get("u"),
            jitter=ov.get("jitter"),
        )
        z_fine = jax.lax.stop_gradient(z_fine)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)

        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
        fine_query = lambda p, x, d: _query(  # noqa: E731 — closure for remat
            p, x, d, xyz_freqs, sigma_mode, compute_dtype, use_fused,
            dir_freqs, fused_channel_io, fused_wide_infer,
        )
        if remat_fine:
            # trade FLOPs for HBM: recompute the fine MLP activations in the
            # backward pass instead of storing (N_rays, S, 4) intermediates
            fine_query = jax.checkpoint(fine_query)
        sigmas_f, rgbs_f = fine_query(params_fine, xyz_fine, dirs_for_query)
        weights_fine = compute_weights(
            sigmas_f, z_all, rays_d, noise_std, key=k_noise_f,
            noise=ov.get("noise_fine"),
        )
        comp = composite(
            weights_fine, z_all, rgbs_f, white_back=white_back and not sigma_mode
        )
        result["depth_fine"] = comp["depth"]
        result["opacity_fine"] = comp["opacity"]
        if not sigma_mode:
            result["rgb_fine"] = comp["rgb"]
        if want_disp:
            result["disp_map_fine"] = comp["disp"]

    return result
