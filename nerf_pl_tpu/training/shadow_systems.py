"""Shadow-mapping training systems.

Four trainers mirror the reference's shadow ``train_*.py`` files:

  * ``EfficientSMSystem``   — flagship per-ray shadow trainer
    (``train_efficient_sm.py``): sigma-only coarse+fine camera render, a
    CACHED full light-view depth render refreshed every
    ``sample_light_depth_every`` steps (``train_efficient_sm.py:150-172``),
    ``efficient_sm`` compositing, MSE on the shadow maps (the reference
    computes an opacity loss but optimizes sm only,
    ``train_efficient_sm.py:188-204``).
  * ``RGBSMSystem``         — joint RGB+shadow trainer
    (``train_rgb_sm_juntos.py``): rgb_disp render + ``efficient_sm`` into
    ``sm_*`` keys; ``loss = rgb_weight*mse(rgb) + sm_weight*mse(sm)``
    (``train_rgb_sm_juntos.py:181-184``).
  * ``ShadowMappingSystem`` — image-space variant
    (``train_shadow_mapping.py``): whole-image camera+light depth renders,
    per-image ``shadow_mapping`` compositing.
  * ``LightSamplerSystem``  — sampled-light variant
    (``train_light_sampler.py``): project each camera ray into light space
    with ``get_K`` and render ONLY those light rays (``:150-184``).

TPU-first redesign (vs the reference's Lightning loops):
  * The light-depth cache is state in the scan carry — a pytree of
    ``(H*W,)`` depth/opacity arrays — refreshed under ``lax.cond``; with
    ``grad_on_light`` the light render moves inside the loss so gradients
    flow (the reference's ``torch.no_grad`` toggle,
    ``train_efficient_sm.py:158-168``).
  * Batches are CONTIGUOUS slices in dataset order (the reference trains
    these with ``shuffle=False`` so pose-splits stay long,
    ``train_efficient_sm.py:122-127``); our compositor is vectorized over
    poses so this is a parity choice, not a requirement.
  * ``Light_N_importance=-1`` (randomize over {0,8,16,32} per light refresh,
    ``train_efficient_sm.py:153-154``) is resolved per EPOCH on the host
    (shapes are static under jit); each value compiles once and is cached.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..config import Config
from ..data import dataset_dict
from ..ops.rendering import render_rays
from ..ops.shadow_mapping import (
    efficient_sm,
    generate_shadow_map,
    get_normed_w,
    get_projections,
    normalize_min_max,
    shadow_mapping_images,
)
from ..parallel.mesh import make_mesh, replicate, shard_map, shard_rays
from ..tools.render import render_image
from ..utils.visualization import visualize_depth
from .logging import RunLogger
from .losses import mse_loss, opacity_loss, sm_loss
from .metrics import psnr as psnr_metric
from .trainer import NeRFSystem, init_params


def _sigma_render_kwargs(cfg: Config, n_importance: int, train: bool = True) -> dict:
    """Packed channel-major ray IO is on for every render (camera batches,
    light caches, whole images): measured +10% train-step / +23%
    whole-image / +4.7% light fwd+bwd once the transposed backward's
    identity-size bug was fixed (docs/results.md round 3).

    ``--remat_fine`` is honored for TRAIN renders (round 5): the
    grad_on_light recipes at N_importance/Light_N 128 differentiate TWO
    786k-point fine passes in one step — the 64x64ManStatue recipe OOMs
    HBM by 0.7 GB without rematerialization (measured; results.md)."""
    from .trainer import use_fused_for_backend

    return dict(
        N_samples=cfg.N_samples,
        use_disp=cfg.use_disp,
        perturb=cfg.perturb,
        noise_std=cfg.noise_std,
        N_importance=n_importance,
        mode="sigma",
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        use_fused=use_fused_for_backend(cfg),
        fused_channel_io=cfg.fused_channel_io,
        remat_fine=cfg.remat_fine if train else False,
    )


# -- validation-path dispatch economy (round 4) -----------------------------
# The val loops composite + score EAGERLY between the per-image whole-image
# render dispatches; on the remote-tunneled TPU every eager op is its own
# ~20 ms dispatch and every float() a blocking round trip.  Jitting the
# composite and the metric pair — and deferring the scalar fetches to the
# end of validation — leaves only the unavoidable render dispatches per
# image.  The CPU mesh keeps the per-image hard sync (leaving a sharded
# render in flight when the next multi-device program launches can deadlock
# XLA:CPU's collective rendezvous, see trainer.py).

_efficient_sm_val = jax.jit(
    efficient_sm,
    static_argnames=("image_shape", "fine_sampling", "light_has_fine",
                     "shadow_method", "num_poses", "out_prefix"),
)

_shadow_mapping_images_val = jax.jit(
    shadow_mapping_images,
    static_argnames=("image_shape", "batch_size", "fine_sampling",
                     "shadow_method"),
)


@functools.partial(jax.jit, static_argnames=("typ",))
def _val_scalars(out, rgbs, typ):
    return mse_loss(out, rgbs), psnr_metric(out[f"rgb_{typ}"], rgbs)


@functools.partial(jax.jit, static_argnames=("typ",))
def _val_scalars_rgb_sm(out, rgbs, sms, rgb_w, sm_w, typ):
    loss = rgb_w * mse_loss(out, rgbs) + sm_w * sm_loss(out, sms)
    return (loss, psnr_metric(out[f"rgb_{typ}"], rgbs),
            psnr_metric(out[f"sm_{typ}"], sms))


def _sync_if_cpu(tree) -> None:
    if jax.default_backend() == "cpu":
        jax.block_until_ready(tree)


def _light_rays_from_uv_fn(ul, vl, wh, l2w, light_focal, light_near,
                           light_far):
    """Light rays through integer light pixels (ul, vl) — the sampled-
    light trick (reference ``train_light_sampler.py:168-181``).  Pure so
    the train epoch programs AND the jitted val helpers share it."""
    w, h = wh
    dirs = jnp.stack(
        [(ul - w / 2) / light_focal, -(vl - h / 2) / light_focal,
         -jnp.ones_like(ul)], axis=-1,
    )
    rays_d = dirs @ l2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(l2w[:, 3], rays_d.shape)
    nf = jnp.ones_like(rays_o[:, :1])
    return jnp.concatenate(
        [rays_o, rays_d, light_near * nf, light_far * nf], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("wh", "fine"))
def _ls_project(cam_res, pixels, cam_m, cam_eye, light_m, light_eye,
                l2w, light_focal, light_near, light_far, wh, fine):
    """Light-sampler val stage A: project every camera pixel into light
    space and build rays through the (clamped, floored) light pixels —
    ONE dispatch instead of an eager op chain between the two renders."""
    w, h = wh
    depth = cam_res["depth_fine"] if fine else cam_res["depth_coarse"]
    pd_cam = jnp.concatenate([pixels, depth[:, None]], axis=1)
    K = get_projections(cam_m, cam_eye, light_m, light_eye, pd_cam)
    ul = jnp.floor(jnp.clip(K[:, 0], 0.0, w - 1.0))
    vl = jnp.floor(jnp.clip(K[:, 1], 0.0, h - 1.0))
    lrays = _light_rays_from_uv_fn(ul, vl, wh, l2w, light_focal,
                                   light_near, light_far)
    return K, ul, vl, lrays


@functools.partial(jax.jit, static_argnames=("mode",))
def _ls_composite(K, ul, vl, light_depth, light_m, mode):
    """Light-sampler val stage B: shadow map from the sampled light
    depths (reference ``train_light_sampler.py:255-280``)."""
    lpix = jnp.stack([ul + 0.5, vl + 0.5, jnp.ones_like(ul)], axis=1)
    pd_light = jnp.concatenate([lpix, light_depth[:, None]], axis=1)
    w_light = get_normed_w(light_m, pd_light)
    return generate_shadow_map(K[:, 2], w_light[:, 3], mode=mode)


def _fetch_means(*lists):
    """Deferred scalar fetch: one device_get over everything collected."""
    host = jax.device_get(lists)
    return [float(np.mean(x)) for x in host]


def _reject_per_host_data(cfg: Config, trainer_name: str) -> None:
    """``--per_host_data`` is supported by the per-ray trainers
    (NeRFSystem blender/llff; EfficientSM/RGBSM/LightSampler via
    ``_ShadowSystemBase``).  The two callers left — ShadowMappingSystem and
    ShadowsSystem — train on whole-image buffers from the ``shadows``
    loader, whose reference scales top out at 64²×~100 frames
    (``launchers/``): ~13 MB of rays+rgbs per host, where replication is
    the right layout (the per-image composite needs every host's poses
    anyway).  Silently ignoring the flag on a pod would defeat its memory
    purpose — fail loudly instead."""
    if cfg.per_host_data:
        raise ValueError(
            f"--per_host_data is not supported by {trainer_name}; its "
            "whole-image dataset loads fully on every host (justified in "
            "_reject_per_host_data)"
        )


def _reject_global_reshuffle(cfg: Config, trainer_name: str) -> None:
    """The reference trains the shadow pipelines with ``shuffle=False``
    (``train_efficient_sm.py:122-127`` — pose-splits must stay long;
    ``train_shadow_mapping.py`` steps sequential whole images), so
    DistributedSampler-reshuffle semantics do not apply: the contiguous
    batch order is a parity property here, and a global permutation would
    also desynchronize the rays/pixels/pose_idx(/sm) buffers unless all are
    permuted together.  ``ShadowsSystem`` (the vanilla RGB loop on shadow
    data) DOES support the flag.  Fail loudly instead of silently ignoring
    a flag the config documents as an escape hatch."""
    if cfg.global_reshuffle:
        raise ValueError(
            f"--global_reshuffle is not supported by {trainer_name}: the "
            "reference trains this pipeline with shuffle=False (contiguous "
            "pose-splits are a parity property; see "
            "_reject_global_reshuffle)"
        )


def _light_cache_render(params, light_rays, key, rkw):
    """Full light-view sigma render → the cache pytree (always carries a
    ``depth_fine`` slot so the cond branches match; falls back to coarse)."""
    r = render_rays(params.get("coarse"), params.get("fine"), light_rays, key, **rkw)
    return {
        "depth_coarse": r["depth_coarse"],
        "depth_fine": r.get("depth_fine", r["depth_coarse"]),
        "opacity_coarse": r["opacity_coarse"],
        "opacity_fine": r.get("opacity_fine", r["opacity_coarse"]),
    }


def _light_cache_render_sharded(params, light_rays_loc, key, rkw):
    """Light-view render split over the ray mesh: each device renders only
    its shard of the ``H*W`` light rays and the full cache is reassembled
    with a tiled ``all_gather`` — the compositor needs the WHOLE light depth
    map (arbitrary ``w_light[vl, ul]`` gathers), but rendering it is the
    per-refresh hot cost and parallelizes D-fold.  Must be called inside the
    ``shard_map``-ed epoch.  With ``grad_on_light`` gradients flow through
    the ``all_gather`` (transpose = ``psum_scatter``), and the epoch's
    ``pmean`` over per-device grads yields exactly the gradient of the
    device-mean loss — same semantics as the replicated render."""
    local = _light_cache_render(params, light_rays_loc, key, rkw)
    return {
        k: jax.lax.all_gather(v, "rays", tiled=True) for k, v in local.items()
    }


def dump_val_images(logger, cfg, step: int, epoch: int, out, rgbs, typ: str):
    """Per-epoch gt/rgb/depth/disp PNG dumps + TB image grid, shared by every
    shadow trainer (reference ``train_efficient_sm.py:241-263``,
    ``train_shadow_mapping.py:173-195``, ``train_light_sampler.py:283-308``)."""
    if not logger.primary:
        return  # multi-host: PNG dumps are process-0 only
    import imageio.v2 as imageio

    W, H = cfg.img_wh
    d = os.path.join(logger.dir, "imgs")
    os.makedirs(d, exist_ok=True)
    to8b = lambda x: (  # noqa: E731
        255 * np.clip(np.nan_to_num(np.asarray(x)), 0, 1)
    ).astype(np.uint8)  # disp can be NaN on empty rays (reference documents
    # the same fragility, rendering_shadows.py:356-357)
    imageio.imwrite(
        os.path.join(d, f"gt_{epoch:03d}.png"),
        to8b(np.asarray(rgbs).reshape(H, W, 3)),
    )
    imageio.imwrite(
        os.path.join(d, f"rgb_{epoch:03d}.png"),
        to8b(np.asarray(out[f"rgb_{typ}"]).reshape(H, W, 3)),
    )
    depth = visualize_depth(np.asarray(out[f"depth_{typ}"]).reshape(H, W))
    imageio.imwrite(
        os.path.join(d, f"depth_{epoch:03d}.png"),
        to8b(depth.transpose(1, 2, 0)),
    )
    if f"disp_map_{typ}" in out:
        disp = normalize_min_max(
            jnp.asarray(out[f"disp_map_{typ}"])
        ).reshape(H, W)
        imageio.imwrite(os.path.join(d, f"disp_{epoch:03d}.png"), to8b(disp))
    stack = np.stack(
        [
            np.asarray(rgbs).reshape(H, W, 3).transpose(2, 0, 1),
            np.asarray(out[f"rgb_{typ}"]).reshape(H, W, 3).transpose(2, 0, 1),
            depth,
        ]
    )
    logger.images(step, "val/GT_pred_depth", stack)


class _ShadowSystemBase(NeRFSystem):
    """Shared dataset/buffer plumbing for the per-ray shadow systems."""

    dataset_kwargs_keys = ()

    def _dataset_kwargs(self) -> dict:
        cfg = self.cfg
        kw = dict(root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh))
        if cfg.dataset_name == "efficient_sm":
            kw.update(white_pix=cfg.white_pix, blur=cfg.blur)
        elif cfg.dataset_name == "rgb_sm":
            kw.update(max_images=cfg.max_images, blur=cfg.blur, seed=cfg.seed)
        elif cfg.dataset_name == "pyredner2":
            kw.update(
                coords_trans=cfg.coords_trans,
                coords_trans2=cfg.coords_trans2,
                blur=cfg.blur,
            )
        return kw

    def _prepare_data(self):
        cfg = self.cfg
        _reject_global_reshuffle(cfg, type(self).__name__)
        ds_cls = dataset_dict[cfg.dataset_name]
        kw = self._dataset_kwargs()
        # pod-scale host pipeline (VERDICT round-2 next #6): the flagship
        # shadow trainers scale like the vanilla one — each host loads only
        # kept-frames[process_index::process_count]; pose tables stay full
        # (replicated in-step), pose_idx stays global
        per_host = cfg.per_host_data and jax.process_count() > 1
        self._per_host = per_host
        train_kw = kw
        if cfg.per_host_data:
            if cfg.dataset_name not in ("efficient_sm", "rgb_sm"):
                raise ValueError(
                    "--per_host_data supports the efficient_sm and rgb_sm "
                    f"shadow loaders (got {cfg.dataset_name})"
                )
            if per_host:
                train_kw = dict(
                    kw,
                    frame_shard=(jax.process_index(), jax.process_count()),
                )
        self.train_dataset = ds_cls(split="train", **train_kw)
        self.val_dataset = ds_cls(split="val", **kw)
        self.white_back = self.train_dataset.white_back
        ds = self.train_dataset
        buf_names = ["all_rays", "all_rgbs", "all_pixels", "pose_idx"]
        bufs = [ds.all_rays, ds.all_rgbs, ds.all_pixels,
                ds.pose_idx.astype(np.int32)[:, None]]
        if hasattr(ds, "all_sm"):
            buf_names.append("all_sm")
            bufs.append(ds.all_sm)
        if per_host:
            # content-dependent per-ray filters (white_pix) keep different
            # row counts per host even after wrap-padded frame shards —
            # equalize to the global MAX so shard_rays(local=True)'s
            # global-MIN truncation drops nothing (review round 3)
            from jax.experimental import multihost_utils

            from ..data.sharding import equalize_rows

            n_local = bufs[0].shape[0]
            all_rows = np.asarray(
                multihost_utils.process_allgather(
                    jnp.asarray([n_local], jnp.int32)
                )
            ).reshape(-1)
            bufs = equalize_rows(bufs, n_local, int(all_rows.max()))
        # keyed by name, not position: a loader without all_sm must fail
        # loudly in RGBSMSystem (KeyError), never silently shard pose_idx
        # as shadow targets (review round 3)
        self._train_bufs = dict(zip(buf_names, bufs))
        self.rays_buf = shard_rays(bufs[0], self.mesh, local=per_host)
        self.rgbs_buf = shard_rays(bufs[1], self.mesh, local=per_host)
        self.pixels_buf = shard_rays(bufs[2], self.mesh, local=per_host)
        self.pose_idx_buf = shard_rays(bufs[3], self.mesh, local=per_host)
        self.cam_ms = replicate(jnp.asarray(ds.cam_ms), self.mesh)
        self.cam_eyes = replicate(jnp.asarray(ds.cam_eyes), self.mesh)
        self.num_poses = int(ds.cam_ms.shape[0])
        light = ds.light
        self.light_rays = replicate(jnp.asarray(light.rays), self.mesh)
        self.light_pixels = replicate(jnp.asarray(light.pixels), self.mesh)
        self.light_m = replicate(jnp.asarray(light.camera), self.mesh)
        self.light_eye = replicate(jnp.asarray(light.eye_pos), self.mesh)
        # the light-view render shards over the mesh when H*W divides the
        # device count (shard_rays TRUNCATES otherwise — every light pixel
        # must render, so fall back to the replicated render if not)
        self.shard_light = (
            int(light.rays.shape[0]) % self.mesh.devices.size == 0
        )
        self.light_rays_in = (
            shard_rays(np.asarray(light.rays), self.mesh)
            if self.shard_light else self.light_rays
        )

    def _dump_val_images(self, epoch, out, rgbs, typ):
        # 4 PNG encodes per val epoch — off the epoch critical path (the
        # render outputs are not donated, so the writer thread's fetch is
        # race-free); fit() drains the writer before returning
        self._writer.submit(
            lambda: dump_val_images(
                self.logger, self.cfg, epoch * self.steps_per_epoch, epoch,
                out, rgbs, typ,
            )
        )

    def _tables(self):
        return {
            "light_pixels": self.light_pixels,
            "light_m": self.light_m,
            "light_eye": self.light_eye,
            "cam_ms": self.cam_ms,
            "cam_eyes": self.cam_eyes,
        }


class EfficientSMSystem(_ShadowSystemBase):
    """Flagship shadow trainer (reference ``train_efficient_sm.py``)."""

    def __init__(self, cfg: Config):
        if cfg.grad_on_light:
            cfg.sample_light_depth_every = 1
        super().__init__(cfg)
        self._epoch_fns: Dict[int, Any] = {}

    # NeRFSystem.__init__ builds self.epoch_fn via make_epoch_fn; shadow
    # systems build their own per-Light_N_importance programs instead.
    def _build_epoch_fn(self):
        return None

    def _resolve_light_n(self, epoch: int) -> int:
        cfg = self.cfg
        if cfg.Light_N_importance == -1:
            rng = np.random.RandomState(cfg.seed + epoch)
            return int(rng.choice([0, 8, 16, 32]))
        return cfg.Light_N_importance

    def _dispatch_plan(self):
        """Split the epoch into (buf_step0, n_steps) device dispatches.

        ``--max_steps_per_dispatch`` bounds one device program's length:
        the 128² grad_on_light recipes put a ~2M-point differentiable
        light render in EVERY step, and a whole-epoch program (640 steps,
        minutes of device time) crashes the remote-tunneled TPU worker —
        measured twice, while 128-step dispatches run fine (results.md).
        The sliced trajectory is IDENTICAL to the monolithic one (rng
        keys and cache-refresh schedule are phrased on within-epoch
        indices; the light cache carries across dispatches).
        Checkpoint/resume stays EPOCH-granular: a preemption landing
        between slabs saves epoch e-1 so resume re-runs the interrupted
        epoch in full (see ``_fit_prologue`` — labeling mid-epoch params
        as epoch e would make resume skip the remaining slabs)."""
        msd = int(getattr(self.cfg, "max_steps_per_dispatch", 0) or 0)
        steps = self.steps_per_epoch
        if msd <= 0 or msd >= steps:
            return [(0, None)]  # whole epoch, steps from the buffer shape
        return [(lo, min(msd, steps - lo)) for lo in range(0, steps, msd)]

    def _epoch_fn_for(self, light_n: int, n_steps: Optional[int] = None):
        cache_key = (light_n, n_steps)
        if cache_key in self._epoch_fns:
            return self._epoch_fns[cache_key]
        cfg = self.cfg
        mesh = self.mesh
        optimizer = self.optimizer
        B = cfg.batch_size
        rkw_cam = _sigma_render_kwargs(cfg, cfg.N_importance)
        rkw_light = _sigma_render_kwargs(cfg, light_n)
        fine = cfg.N_importance > 0
        k_update = max(1, cfg.sample_light_depth_every)
        grad_on_light = cfg.grad_on_light
        image_shape = tuple(cfg.img_wh)
        num_poses = self.num_poses
        shadow_method = cfg.shadow_method
        light_render = (
            _light_cache_render_sharded if self.shard_light
            else _light_cache_render
        )

        def compose_loss(params, batch, tables, light_rays_in, light_depths,
                         key):
            rays, rgbs, pixels, pose_idx = batch
            kc, kl = jax.random.split(key)
            cam_res = render_rays(
                params.get("coarse"), params.get("fine"), rays, kc, **rkw_cam
            )
            if grad_on_light:
                light_depths = light_render(
                    params, light_rays_in, kl, rkw_light
                )
            out = efficient_sm(
                pixels,
                tables["light_pixels"],
                cam_res,
                light_depths,
                tables["cam_ms"][pose_idx],
                tables["cam_eyes"][pose_idx],
                tables["light_m"],
                tables["light_eye"],
                image_shape,
                fine_sampling=fine,
                light_has_fine=light_n > 0,
                shadow_method=shadow_method,
                pose_idx=pose_idx,
                num_poses=num_poses,
            )
            loss = mse_loss(out, rgbs)
            typ = "fine" if fine else "coarse"
            psnr = psnr_metric(out[f"rgb_{typ}"], rgbs)
            # logged-only light opacity loss; the reference indexes the
            # (H*W,) light opacities with batch-derived indices
            # (train_efficient_sm.py:191, losses.py:40-42) — i.e. its first
            # B entries partitioned by the batch targets
            # clamp to the light view's H*W: with batch > H*W the reference
            # would index its (H*W,) opacities out of bounds
            # (train_efficient_sm.py:191) — score the first min(B, H*W)
            # rows instead (logged-only term, never optimized)
            b = min(rgbs.shape[0], light_depths["opacity_coarse"].shape[0])
            # the cache aliases opacity_fine = opacity_coarse when the light
            # render has no fine pass; include the fine term only when it is
            # a real fine render (reference adds it only when present,
            # losses.py:50-51 there) to avoid double-counting
            op_in = {"opacity_coarse": light_depths["opacity_coarse"][:b]}
            if light_n > 0:
                op_in["opacity_fine"] = light_depths["opacity_fine"][:b]
            op_loss = opacity_loss(op_in, rgbs[:b])
            return loss, (psnr, op_loss)

        def device_epoch(
            params, opt_state, light_depths, rays, rgbs, pixels, pose_idx,
            light_rays_in, tables, epoch_key, step0, buf_step0,
        ):
            # steps: static slab length, or the whole local buffer.
            # buf_step0 (traced) is the within-epoch step offset — rng
            # keys, buffer slices and the refresh schedule all use the
            # within-epoch index so a sliced epoch bit-matches monolithic
            n_loc = rays.shape[0]
            steps = n_steps if n_steps is not None else n_loc // B
            dev = jax.lax.axis_index("rays")

            def body(carry, i):
                params, opt_state, light_depths = carry
                ei = buf_step0 + i  # within-epoch step index
                gstep = step0 + ei
                key = jax.random.fold_in(jax.random.fold_in(epoch_key, dev), ei)
                kup, kstep = jax.random.split(key)
                # with grad_on_light the loss re-renders the light view with
                # gradients enabled every step (reference renders it exactly
                # once per step, train_efficient_sm.py:150-172), so refreshing
                # the no-grad cache here would double the light-render cost
                if not grad_on_light:
                    light_depths = jax.lax.cond(
                        # ei == 0: the cache buffer is zeroed at each epoch
                        # start, so always refresh on the first step —
                        # otherwise epochs whose step0 is not a k_update
                        # multiple would train early steps against an
                        # all-zero light depth map
                        (gstep % k_update == 0) | (ei == 0),
                        lambda p: jax.lax.stop_gradient(
                            light_render(p, light_rays_in, kup, rkw_light)
                        ),
                        lambda p: light_depths,
                        params,
                    )
                # contiguous slice batching (reference shuffle=False parity)
                sl = ei * B
                batch = (
                    jax.lax.dynamic_slice_in_dim(rays, sl, B),
                    jax.lax.dynamic_slice_in_dim(rgbs, sl, B),
                    jax.lax.dynamic_slice_in_dim(pixels, sl, B),
                    jax.lax.dynamic_slice_in_dim(pose_idx, sl, B)[:, 0],
                )
                (loss, (psnr, op_loss)), grads = jax.value_and_grad(
                    compose_loss, has_aux=True
                )(params, batch, tables, light_rays_in, light_depths, kstep)
                grads = jax.lax.pmean(grads, "rays")
                loss = jax.lax.pmean(loss, "rays")
                psnr = jax.lax.pmean(psnr, "rays")
                op_loss = jax.lax.pmean(op_loss, "rays")
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, light_depths), (loss, psnr, op_loss)

            (params, opt_state, light_depths), (losses, psnrs, op_losses) = (
                jax.lax.scan(
                    body, (params, opt_state, light_depths), jnp.arange(steps)
                )
            )
            return params, opt_state, light_depths, losses, psnrs, op_losses

        fn = shard_map(
            device_epoch,
            mesh,
            in_specs=(
                P(), P(), P(), P("rays"), P("rays"), P("rays"), P("rays"),
                P("rays") if self.shard_light else P(),
                P(), P(), P(), P(),
            ),
            out_specs=(P(), P(), P(), P(), P(), P()),
        )
        jitted = jax.jit(fn, donate_argnums=(0, 1, 2))
        self._epoch_fns[cache_key] = jitted
        return jitted

    def _init_light_cache(self):
        hw = self.light_rays.shape[0]
        # four DISTINCT buffers — the cache is donated, and donating one
        # buffer twice is an error
        return replicate(
            {
                "depth_coarse": jnp.zeros((hw,), jnp.float32),
                "depth_fine": jnp.zeros((hw,), jnp.float32),
                "opacity_coarse": jnp.zeros((hw,), jnp.float32),
                "opacity_fine": jnp.zeros((hw,), jnp.float32),
            },
            self.mesh,
        )

    def fit(self):
        cfg = self.cfg
        self._fit_prologue()
        if cfg.num_sanity_val_steps > 0:
            print(f"[sanity] {self.validation(0, max_images=cfg.num_sanity_val_steps)}")
        global_step = self.epoch0 * self.steps_per_epoch
        plan = self._dispatch_plan()
        for epoch in range(self.epoch0, cfg.num_epochs):
            self._last_epoch = epoch
            light_n = self._resolve_light_n(epoch)
            light_cache = self._init_light_cache()
            self.rng, ek = jax.random.split(self.rng)
            t0 = time.time()
            parts = []
            # mid-epoch params must not be checkpointed AS epoch e: mark
            # the epoch incomplete until the last slab lands so a SIGTERM
            # between dispatches saves epoch e-1 and resume re-runs e
            self._epoch_complete = len(plan) == 1
            for si, (lo, k) in enumerate(plan):
                epoch_fn = self._epoch_fn_for(light_n, k)
                (
                    self.params, self.opt_state, light_cache, lk, pk, ok
                ) = epoch_fn(
                    self.params, self.opt_state, light_cache, self.rays_buf,
                    self.rgbs_buf, self.pixels_buf, self.pose_idx_buf,
                    self.light_rays_in, self._tables(), ek,
                    jnp.int32(global_step), jnp.int32(lo),
                )
                parts.append((lk, pk, ok))
                if si == len(plan) - 1:
                    self._epoch_complete = True
            losses, psnrs, op_losses = (
                np.concatenate([np.asarray(x[j]) for x in parts])
                for j in range(3)
            )
            dt = time.time() - t0
            global_step += self.steps_per_epoch
            self.logger.scalars(
                global_step,
                {
                    "lr": float(self.schedule(global_step)),
                    "train/loss": float(losses.mean()),
                    "train/psnr": float(psnrs.mean()),
                    "train/train_opactiy": float(np.asarray(op_losses).mean()),
                },
            )
            msg = (
                f"epoch {epoch}: sm_loss {losses.mean():.5f} "
                f"psnr {psnrs.mean():.2f} (Light_N={light_n}, {dt:.1f}s)"
            )
            if (epoch + 1) % cfg.val_every_n_epochs == 0 or epoch == cfg.num_epochs - 1:
                vm = self.validation(epoch)
                self.logger.scalars(global_step, vm)
                msg += f" | val loss {vm['val/loss']:.5f} psnr {vm['val/psnr']:.2f}"
                self.save_ckpt(epoch, vm["val/loss"])
            print(msg, flush=True)
        self._writer.drain()  # pending ckpt/PNG writes land before return
        self.logger.close()
        return self.params

    # -- validation: full-image camera + light render then compositing ------
    def validation(self, epoch: int, max_images: Optional[int] = None):
        cfg = self.cfg
        rkw = _sigma_render_kwargs(cfg, cfg.N_importance, train=False)
        n_img = len(self.val_dataset)
        if max_images is not None:
            n_img = min(n_img, max_images)
        losses, psnrs = [], []
        light_depths = None  # one light rig for all val frames: render once
        for i in range(n_img):
            sample = self.val_dataset[i]
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            cam_res = render_image(
                self.params, jnp.asarray(sample["rays"]), k1, chunk=cfg.chunk,
                mesh=self.mesh, **rkw,
            )
            if light_depths is None:
                light_res = render_image(
                    self.params, jnp.asarray(sample["light_rays"]), k2,
                    chunk=cfg.chunk, mesh=self.mesh, **rkw,
                )
                light_depths = {
                    "depth_coarse": light_res["depth_coarse"],
                    "depth_fine": light_res.get(
                        "depth_fine", light_res["depth_coarse"]
                    ),
                }
            out = _efficient_sm_val(
                jnp.asarray(sample["pixels"]),
                jnp.asarray(self.val_dataset.light.pixels),
                cam_res,
                light_depths,
                jnp.asarray(sample["ppc"]["camera"]),
                jnp.asarray(sample["ppc"]["eye_pos"]),
                jnp.asarray(sample["light_ppc"]["camera"]),
                jnp.asarray(sample["light_ppc"]["eye_pos"]),
                image_shape=tuple(cfg.img_wh),
                fine_sampling=cfg.N_importance > 0,
                light_has_fine=cfg.N_importance > 0,
                shadow_method=cfg.shadow_method,
            )
            rgbs = jnp.asarray(sample["rgbs"])
            _sync_if_cpu((cam_res, out))
            typ = "fine" if "rgb_fine" in out else "coarse"
            loss_i, psnr_i = _val_scalars(out, rgbs, typ)
            losses.append(loss_i)
            psnrs.append(psnr_i)
            if i == 0:
                self._dump_val_images(epoch, out, rgbs, typ)
        loss, psnr = _fetch_means(losses, psnrs)
        return {"val/loss": loss, "val/psnr": psnr}


class RGBSMSystem(EfficientSMSystem):
    """Joint RGB + shadow trainer (reference ``train_rgb_sm_juntos.py``):
    the camera render keeps its real RGB (mode ``rgb_disp``), the shadow
    compositor writes ``sm_*`` keys, and the loss is
    ``rgb_weight * mse(rgb) + sm_weight * mse(sm)``
    (``train_rgb_sm_juntos.py:181-184``)."""

    def _prepare_data(self):
        super()._prepare_data()
        # all_sm is row-equalized alongside the other buffers by the base
        # class (per-host white_pix-style filters); keyed lookup fails loud
        # if the loader has no shadow targets
        if "all_sm" not in self._train_bufs:
            raise KeyError(
                f"dataset {type(self.train_dataset).__name__} exposes no "
                "all_sm buffer — rgb_sm training needs shadow-map targets"
            )
        self.sm_buf = shard_rays(
            self._train_bufs["all_sm"], self.mesh, local=self._per_host
        )

    def _epoch_fn_for(self, light_n: int, n_steps: Optional[int] = None):
        cache_key = (light_n, n_steps)
        if cache_key in self._epoch_fns:
            return self._epoch_fns[cache_key]
        cfg = self.cfg
        mesh = self.mesh
        optimizer = self.optimizer
        B = cfg.batch_size
        from .trainer import use_fused_for_backend

        rkw_cam = dict(
            N_samples=cfg.N_samples, use_disp=cfg.use_disp,
            perturb=cfg.perturb, noise_std=cfg.noise_std,
            N_importance=cfg.N_importance, mode="rgb_disp",
            white_back=self.white_back,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            use_fused=use_fused_for_backend(cfg),
            fused_channel_io=cfg.fused_channel_io,
        )
        rkw_light = _sigma_render_kwargs(cfg, light_n)
        fine = cfg.N_importance > 0
        k_update = max(1, cfg.sample_light_depth_every)
        grad_on_light = cfg.grad_on_light
        image_shape = tuple(cfg.img_wh)
        num_poses = self.num_poses
        shadow_method = cfg.shadow_method
        rgb_w, sm_w = cfg.rgb_weight, cfg.sm_weight
        light_render = (
            _light_cache_render_sharded if self.shard_light
            else _light_cache_render
        )

        def compose_loss(params, batch, tables, light_rays_in, light_depths,
                         key):
            rays, rgbs, sms, pixels, pose_idx = batch
            kc, kl = jax.random.split(key)
            cam_res = render_rays(
                params.get("coarse"), params.get("fine"), rays, kc, **rkw_cam
            )
            if grad_on_light:
                light_depths = light_render(
                    params, light_rays_in, kl, rkw_light
                )
            out = efficient_sm(
                pixels, tables["light_pixels"], cam_res, light_depths,
                tables["cam_ms"][pose_idx], tables["cam_eyes"][pose_idx],
                tables["light_m"], tables["light_eye"], image_shape,
                fine_sampling=fine, light_has_fine=light_n > 0,
                shadow_method=shadow_method, pose_idx=pose_idx,
                num_poses=num_poses, out_prefix="sm",
            )
            rgb_l = mse_loss(out, rgbs)
            sm_l = sm_loss(out, sms)
            loss = rgb_w * rgb_l + sm_w * sm_l
            typ = "fine" if fine else "coarse"
            psnr = psnr_metric(out[f"rgb_{typ}"], rgbs)
            sm_psnr = psnr_metric(out[f"sm_{typ}"], sms)
            return loss, (psnr, sm_psnr)

        def device_epoch(
            params, opt_state, light_depths, rays, rgbs, sms, pixels,
            pose_idx, light_rays_in, tables, epoch_key, step0, buf_step0,
        ):
            # see EfficientSMSystem.device_epoch: within-epoch index ei
            # makes sliced dispatches bit-match the monolithic epoch
            steps = n_steps if n_steps is not None else rays.shape[0] // B
            dev = jax.lax.axis_index("rays")

            def body(carry, i):
                params, opt_state, light_depths = carry
                ei = buf_step0 + i
                gstep = step0 + ei
                key = jax.random.fold_in(jax.random.fold_in(epoch_key, dev), ei)
                kup, kstep = jax.random.split(key)
                # with grad_on_light the loss re-renders the light view with
                # gradients enabled every step (reference renders it exactly
                # once per step, train_efficient_sm.py:150-172), so refreshing
                # the no-grad cache here would double the light-render cost
                if not grad_on_light:
                    light_depths = jax.lax.cond(
                        # ei == 0: the cache buffer is zeroed at each epoch
                        # start, so always refresh on the first step —
                        # otherwise epochs whose step0 is not a k_update
                        # multiple would train early steps against an
                        # all-zero light depth map
                        (gstep % k_update == 0) | (ei == 0),
                        lambda p: jax.lax.stop_gradient(
                            light_render(p, light_rays_in, kup, rkw_light)
                        ),
                        lambda p: light_depths,
                        params,
                    )
                sl = ei * B
                batch = (
                    jax.lax.dynamic_slice_in_dim(rays, sl, B),
                    jax.lax.dynamic_slice_in_dim(rgbs, sl, B),
                    jax.lax.dynamic_slice_in_dim(sms, sl, B),
                    jax.lax.dynamic_slice_in_dim(pixels, sl, B),
                    jax.lax.dynamic_slice_in_dim(pose_idx, sl, B)[:, 0],
                )
                (loss, (psnr, sm_psnr)), grads = jax.value_and_grad(
                    compose_loss, has_aux=True
                )(params, batch, tables, light_rays_in, light_depths, kstep)
                grads = jax.lax.pmean(grads, "rays")
                loss = jax.lax.pmean(loss, "rays")
                psnr = jax.lax.pmean(psnr, "rays")
                sm_psnr = jax.lax.pmean(sm_psnr, "rays")
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, light_depths), (loss, psnr, sm_psnr)

            (params, opt_state, light_depths), outs = jax.lax.scan(
                body, (params, opt_state, light_depths), jnp.arange(steps)
            )
            return (params, opt_state, light_depths) + outs

        fn = shard_map(
            device_epoch,
            mesh,
            in_specs=(
                P(), P(), P(), P("rays"), P("rays"), P("rays"), P("rays"),
                P("rays"), P("rays") if self.shard_light else P(),
                P(), P(), P(), P(),
            ),
            out_specs=(P(), P(), P(), P(), P(), P()),
        )
        jitted = jax.jit(fn, donate_argnums=(0, 1, 2))
        self._epoch_fns[cache_key] = jitted
        return jitted

    def fit(self):
        cfg = self.cfg
        self._fit_prologue()
        if cfg.num_sanity_val_steps > 0:
            print(f"[sanity] {self.validation(0, max_images=cfg.num_sanity_val_steps)}")
        global_step = self.epoch0 * self.steps_per_epoch
        for epoch in range(self.epoch0, cfg.num_epochs):
            self._last_epoch = epoch
            light_n = self._resolve_light_n(epoch)
            light_cache = self._init_light_cache()
            self.rng, ek = jax.random.split(self.rng)
            t0 = time.time()
            parts = []
            plan = self._dispatch_plan()
            self._epoch_complete = len(plan) == 1  # see EfficientSM.fit
            for si, (lo, k) in enumerate(plan):
                epoch_fn = self._epoch_fn_for(light_n, k)
                (
                    self.params, self.opt_state, light_cache, lk, pk, sk
                ) = epoch_fn(
                    self.params, self.opt_state, light_cache, self.rays_buf,
                    self.rgbs_buf, self.sm_buf, self.pixels_buf,
                    self.pose_idx_buf, self.light_rays_in, self._tables(),
                    ek, jnp.int32(global_step), jnp.int32(lo),
                )
                parts.append((lk, pk, sk))
                if si == len(plan) - 1:
                    self._epoch_complete = True
            losses, psnrs, sm_psnrs = (
                np.concatenate([np.asarray(x[j]) for x in parts])
                for j in range(3)
            )
            dt = time.time() - t0
            global_step += self.steps_per_epoch
            self.logger.scalars(
                global_step,
                {
                    "lr": float(self.schedule(global_step)),
                    "train/loss": float(losses.mean()),
                    "train/psnr": float(np.asarray(psnrs).mean()),
                    "train/sm_psnr": float(np.asarray(sm_psnrs).mean()),
                },
            )
            msg = (
                f"epoch {epoch}: loss {losses.mean():.5f} psnr "
                f"{np.asarray(psnrs).mean():.2f} sm_psnr "
                f"{np.asarray(sm_psnrs).mean():.2f} ({dt:.1f}s)"
            )
            if (epoch + 1) % cfg.val_every_n_epochs == 0 or epoch == cfg.num_epochs - 1:
                vm = self.validation(epoch)
                self.logger.scalars(global_step, vm)
                msg += f" | val loss {vm['val/loss']:.5f} psnr {vm['val/psnr']:.2f}"
                self.save_ckpt(epoch, vm["val/loss"])
            print(msg, flush=True)
        self._writer.drain()  # pending ckpt/PNG writes land before return
        self.logger.close()
        return self.params

    def validation(self, epoch: int, max_images=None):
        cfg = self.cfg
        from .trainer import use_fused_for_backend

        rkw = dict(
            N_samples=cfg.N_samples, use_disp=cfg.use_disp,
            perturb=cfg.perturb, noise_std=cfg.noise_std,
            N_importance=cfg.N_importance, mode="rgb_disp",
            white_back=self.white_back,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            use_fused=use_fused_for_backend(cfg),
            fused_channel_io=cfg.fused_channel_io,
        )
        rkw_light = _sigma_render_kwargs(cfg, cfg.N_importance, train=False)
        n_img = len(self.val_dataset)
        if max_images is not None:
            n_img = min(n_img, max_images)
        losses, psnrs, sm_psnrs = [], [], []
        light_depths = None  # one light rig for all val frames: render once
        for i in range(n_img):
            s = self.val_dataset[i]
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            cam_res = render_image(
                self.params, jnp.asarray(s["rays"]), k1, chunk=cfg.chunk,
                mesh=self.mesh, **rkw,
            )
            if light_depths is None:
                light_res = render_image(
                    self.params, jnp.asarray(s["light_rays"]), k2,
                    chunk=cfg.chunk, mesh=self.mesh, **rkw_light,
                )
                light_depths = {
                    "depth_coarse": light_res["depth_coarse"],
                    "depth_fine": light_res.get(
                        "depth_fine", light_res["depth_coarse"]
                    ),
                }
            out = _efficient_sm_val(
                jnp.asarray(s["pixels"]), jnp.asarray(s["light_pixels"]),
                cam_res, light_depths,
                jnp.asarray(s["ppc"]["camera"]), jnp.asarray(s["ppc"]["eye_pos"]),
                jnp.asarray(s["light_ppc"]["camera"]),
                jnp.asarray(s["light_ppc"]["eye_pos"]),
                image_shape=tuple(cfg.img_wh), fine_sampling=cfg.N_importance > 0,
                light_has_fine=cfg.N_importance > 0,
                shadow_method=cfg.shadow_method, out_prefix="sm",
            )
            rgbs = jnp.asarray(s["rgbs"])
            sms = jnp.asarray(s["sm"])
            _sync_if_cpu((cam_res, out))
            typ = "fine" if "rgb_fine" in out else "coarse"
            loss_i, psnr_i, sm_psnr_i = _val_scalars_rgb_sm(
                out, rgbs, sms, cfg.rgb_weight, cfg.sm_weight, typ
            )
            losses.append(loss_i)
            psnrs.append(psnr_i)
            sm_psnrs.append(sm_psnr_i)
            if i == 0:
                self._dump_val_images(epoch, out, rgbs, typ)
        loss, psnr, sm_psnr = _fetch_means(losses, psnrs, sm_psnrs)
        return {
            "val/loss": loss,
            "val/psnr": psnr,
            "val/sm_psnr": sm_psnr,
        }


class LightSamplerSystem(_ShadowSystemBase):
    """Sampled-light shadow trainer (reference ``train_light_sampler.py``):
    instead of caching a full H×W light depth map, each step projects the
    camera batch into light space with ``get_K`` and renders ONLY those B
    light rays (``train_light_sampler.py:150-184``).

    Faithful quirk: the loss reads ``rgb_coarse`` only — the reference
    stores the fine map under a key (``'fine'``) the MSE loss never looks at
    (``train_light_sampler.py:198-201``), so fine supervision is a no-op;
    we write only ``rgb_coarse``.
    """

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self._epoch_fn_cached = None

    def _build_epoch_fn(self):
        return None

    def _light_geom(self):
        light = self.train_dataset.light
        return (
            jnp.asarray(light.l2w),
            jnp.float32(light.focal),
            jnp.float32(light.near),
            jnp.float32(light.far),
        )

    def _light_rays_from_uv(self, ul, vl):
        """Light rays through integer light pixels (ul, vl) — the sampled-
        light trick (reference ``train_light_sampler.py:168-181`` and the
        identical block in its ``validation_step``, ``:236-254``)."""
        l2w, light_focal, light_near, light_far = self._light_geom()
        return _light_rays_from_uv_fn(
            ul, vl, tuple(self.cfg.img_wh), l2w, light_focal, light_near,
            light_far,
        )

    def _epoch_fn(self):
        if self._epoch_fn_cached is not None:
            return self._epoch_fn_cached
        cfg = self.cfg
        optimizer = self.optimizer
        B = cfg.batch_size
        w, h = cfg.img_wh
        rkw_cam = _sigma_render_kwargs(cfg, cfg.N_importance)
        rkw_light = _sigma_render_kwargs(cfg, max(cfg.Light_N_importance, 0))
        light_n = max(cfg.Light_N_importance, 0)
        fine = cfg.N_importance > 0
        shadow_method = cfg.shadow_method
        light_rays_for = self._light_rays_from_uv

        def compose_loss(params, batch, tables, key):
            rays, rgbs, pixels, pose_idx = batch
            kc, kl = jax.random.split(key)
            cam_res = render_rays(
                params.get("coarse"), params.get("fine"), rays, kc, **rkw_cam
            )
            depth = cam_res["depth_fine"] if fine else cam_res["depth_coarse"]
            pd_cam = jnp.concatenate([pixels, depth[:, None]], axis=1)
            K = get_projections(
                tables["cam_ms"][pose_idx], tables["cam_eyes"][pose_idx],
                tables["light_m"], tables["light_eye"], pd_cam,
            )
            ul = jnp.clip(K[:, 0], 0.0, w - 1.0)
            vl = jnp.clip(K[:, 1], 0.0, h - 1.0)
            ul_i = jnp.floor(ul).astype(jnp.float32)
            vl_i = jnp.floor(vl).astype(jnp.float32)
            lrays = light_rays_for(ul_i, vl_i)
            light_res = render_rays(
                params.get("coarse"), params.get("fine"),
                jax.lax.stop_gradient(lrays), kl, **rkw_light,
            )
            # reference parity: the light render happens INSIDE the training
            # graph (train_light_sampler.py:182-186 — its
            # were_gradients_computed flag is dead, detach there only hits
            # sample_pdf), so gradients flow through BOTH the camera-depth
            # and light-depth paths
            range_light = (
                light_res["depth_fine"] if light_n > 0
                else light_res["depth_coarse"]
            )
            lpix = jnp.stack(
                [ul_i + 0.5, vl_i + 0.5, jnp.ones_like(ul_i)], axis=1
            )
            pd_light = jnp.concatenate([lpix, range_light[:, None]], axis=1)
            w_light = get_normed_w(tables["light_m"], pd_light)
            sm = generate_shadow_map(K[:, 2], w_light[:, 3], mode=shadow_method)
            loss = jnp.mean((sm - rgbs) ** 2)
            psnr = psnr_metric(sm, rgbs)
            return loss, psnr

        def device_epoch(
            params, opt_state, rays, rgbs, pixels, pose_idx, tables,
            epoch_key, step0,
        ):
            steps = rays.shape[0] // B
            dev = jax.lax.axis_index("rays")

            def body(carry, i):
                params, opt_state = carry
                key = jax.random.fold_in(jax.random.fold_in(epoch_key, dev), i)
                sl = i * B
                batch = (
                    jax.lax.dynamic_slice_in_dim(rays, sl, B),
                    jax.lax.dynamic_slice_in_dim(rgbs, sl, B),
                    jax.lax.dynamic_slice_in_dim(pixels, sl, B),
                    jax.lax.dynamic_slice_in_dim(pose_idx, sl, B)[:, 0],
                )
                (loss, psnr), grads = jax.value_and_grad(
                    compose_loss, has_aux=True
                )(params, batch, tables, key)
                grads = jax.lax.pmean(grads, "rays")
                loss = jax.lax.pmean(loss, "rays")
                psnr = jax.lax.pmean(psnr, "rays")
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, psnr)

            (params, opt_state), (losses, psnrs) = jax.lax.scan(
                body, (params, opt_state), jnp.arange(steps)
            )
            return params, opt_state, losses, psnrs

        fn = shard_map(
            device_epoch,
            self.mesh,
            in_specs=(
                P(), P(), P("rays"), P("rays"), P("rays"), P("rays"),
                P(), P(), P(),
            ),
            out_specs=(P(), P(), P(), P()),
        )
        self._epoch_fn_cached = jax.jit(fn, donate_argnums=(0, 1))
        return self._epoch_fn_cached

    def fit(self):
        cfg = self.cfg
        self._fit_prologue()
        if cfg.num_sanity_val_steps > 0:
            print(f"[sanity] {self.validation(0, max_images=cfg.num_sanity_val_steps)}")
        global_step = self.epoch0 * self.steps_per_epoch
        epoch_fn = self._epoch_fn()
        for epoch in range(self.epoch0, cfg.num_epochs):
            self._last_epoch = epoch
            self.rng, ek = jax.random.split(self.rng)
            t0 = time.time()
            self.params, self.opt_state, losses, psnrs = epoch_fn(
                self.params, self.opt_state, self.rays_buf, self.rgbs_buf,
                self.pixels_buf, self.pose_idx_buf, self._tables(), ek,
                jnp.int32(global_step),
            )
            losses = np.asarray(losses)
            dt = time.time() - t0
            global_step += self.steps_per_epoch
            self.logger.scalars(
                global_step,
                {
                    "lr": float(self.schedule(global_step)),
                    "train/loss": float(losses.mean()),
                    "train/psnr": float(np.asarray(psnrs).mean()),
                },
            )
            msg = (
                f"epoch {epoch}: loss {losses.mean():.5f} "
                f"psnr {np.asarray(psnrs).mean():.2f} ({dt:.1f}s)"
            )
            if (epoch + 1) % cfg.val_every_n_epochs == 0 or epoch == cfg.num_epochs - 1:
                vm = self.validation(epoch)
                self.logger.scalars(global_step, vm)
                msg += f" | val loss {vm['val/loss']:.5f} psnr {vm['val/psnr']:.2f}"
                # top-5 ckpt keyed on VAL loss (reference ModelCheckpoint,
                # train_light_sampler.py:328-332 — round-1 keyed on train
                # loss, VERDICT missing #1)
                self.save_ckpt(epoch, vm["val/loss"])
            print(msg, flush=True)
        self._writer.drain()  # pending ckpt/PNG writes land before return
        self.logger.close()
        return self.params

    def validation(self, epoch: int, max_images: Optional[int] = None):
        """Whole-image validation (reference ``train_light_sampler.py``
        ``validation_step``, ``:217-311``): sigma-render the camera image,
        ``get_K``-project every pixel into light space, build light rays for
        ONLY those (clamped, floored) light pixels, sigma-render them, and
        composite a full validation shadow map.

        Faithful quirks kept: the FINE projections are used when available
        (``:231-238``); the shadow map lands in ``rgb_coarse`` while the fine
        key is the dead ``'fine'`` entry the loss never reads (``:276-280``),
        so metrics/images are coarse-keyed.
        """
        cfg = self.cfg
        w, h = cfg.img_wh
        fine = cfg.N_importance > 0
        light_n = max(cfg.Light_N_importance, 0)
        rkw_cam = _sigma_render_kwargs(cfg, cfg.N_importance)
        rkw_light = _sigma_render_kwargs(cfg, light_n)
        n_img = len(self.val_dataset)
        if max_images is not None:
            n_img = min(n_img, max_images)
        losses, psnrs = [], []
        light_m = jnp.asarray(self.train_dataset.light.camera)
        for i in range(n_img):
            sample = self.val_dataset[i]
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            cam_res = render_image(
                self.params, jnp.asarray(sample["rays"]), k1,
                chunk=cfg.chunk, mesh=self.mesh, **rkw_cam,
            )
            l2w, light_focal, light_near, light_far = self._light_geom()
            K, ul_i, vl_i, lrays = _ls_project(
                {k: jnp.asarray(v) for k, v in cam_res.items()
                 if k.startswith("depth")},
                jnp.asarray(sample["pixels"]),
                jnp.asarray(sample["ppc"]["camera"]),
                jnp.asarray(sample["ppc"]["eye_pos"]),
                light_m, jnp.asarray(self.train_dataset.light.eye_pos),
                l2w, light_focal, light_near, light_far,
                wh=(w, h), fine=fine,
            )
            light_res = render_image(
                self.params, lrays, k2, chunk=cfg.chunk, mesh=self.mesh,
                **rkw_light,
            )
            range_light = (
                light_res["depth_fine"] if light_n > 0
                else light_res["depth_coarse"]
            )
            sm = _ls_composite(
                K, ul_i, vl_i, jnp.asarray(range_light), light_m,
                mode=cfg.shadow_method,
            )
            out = dict(cam_res)
            out["rgb_coarse"] = sm
            rgbs = jnp.asarray(sample["rgbs"])
            _sync_if_cpu((out["rgb_coarse"],))
            loss_i, psnr_i = _val_scalars(out, rgbs, "coarse")
            losses.append(loss_i)
            psnrs.append(psnr_i)
            if i == 0:
                self._dump_val_images(epoch, out, rgbs, "coarse")
        loss, psnr = _fetch_means(losses, psnrs)
        return {
            "val/loss": loss,
            "val/psnr": psnr,
        }


class ShadowMappingSystem:
    """Image-space shadow-mapping trainer (reference
    ``train_shadow_mapping.py``): each step renders whole-image camera AND
    light depth maps and composites with per-image ``shadow_mapping``.

    Mesh story (batches are whole images — reference batch_size is an image
    count, typically 1 — so rays-within-the-image shard instead): the
    expensive sigma renders (``batch*H*W`` camera rays + ``H*W`` light rays,
    64-256 MLP point queries each) run sharded ``P('rays')``; the composite
    is cheap elementwise math plus one gather, but ``shadow_method_2``
    min-max-normalizes over each WHOLE image, so the depth maps are
    ``all_gather``-ed and the composite+loss run replicated on every device.
    Autodiff through the gather routes each device's cotangent slice back
    via ``psum_scatter`` with a factor of the device count (the loss is
    computed once per device), so the final ``pmean`` of the grads restores
    exactly the full-batch gradient (asserted vs the 1-device program in
    ``tests/test_shadow_systems.py``)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        _reject_per_host_data(cfg, type(self).__name__)
        _reject_global_reshuffle(cfg, type(self).__name__)
        if cfg.compilation_cache and jax.default_backend() == "tpu":
            # standalone trainer (not a NeRFSystem subclass): enable the
            # persistent cache here too — its whole-image step compiles for
            # ~10 min on a remote tunnel and restores in seconds when cached
            from ..utils.profiling import enable_compilation_cache

            enable_compilation_cache()
        w, h = cfg.img_wh
        requested = cfg.num_devices or jax.device_count()
        nd = requested
        while (w * h) % nd:  # both ray populations are multiples of H*W
            nd -= 1
        if nd != requested:
            if cfg.num_devices:
                # fail loud on an explicit, unusable --num_devices (advisor
                # round 2): quietly dropping to nd loses the D-fold speedup
                raise ValueError(
                    f"--num_devices {requested} does not divide "
                    f"H*W={w * h}; largest usable mesh is {nd}"
                )
            print(
                f"[ShadowMappingSystem] {requested} devices do not divide "
                f"H*W={w * h}; using a {nd}-device mesh", flush=True,
            )
        self.mesh = make_mesh(nd)
        self.logger = RunLogger(cfg.log_dir, cfg.exp_name)
        self.rng = jax.random.PRNGKey(cfg.seed)
        ds_cls = dataset_dict[cfg.dataset_name]
        kw = dict(root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh))
        self.train_dataset = ds_cls(split="train", **kw)
        self.val_dataset = ds_cls(split="val", **kw)
        items = [self.train_dataset[i] for i in range(len(self.train_dataset))]
        self.rays = jnp.asarray(np.stack([it["rays"] for it in items]))
        self.rgbs = jnp.asarray(np.stack([it["rgbs"] for it in items]))
        self.cam_ms = jnp.asarray(
            np.stack([it["ppc"]["camera"] for it in items])
        )
        self.cam_eyes = jnp.asarray(
            np.stack([it["ppc"]["eye_pos"] for it in items])
        )
        from jax.sharding import NamedSharding

        light = self.train_dataset.light
        # pre-place the light buffer P('rays') once — an unsharded array
        # would be relayouted by jit on EVERY step of the per-step loop
        self.light_rays = jax.device_put(
            jnp.asarray(light.rays), NamedSharding(self.mesh, P("rays"))
        )
        self.light_m = jnp.asarray(light.camera)
        self.light_eye = jnp.asarray(light.eye_pos)
        self.light_tables = {
            "rays": self.light_rays, "m": self.light_m, "eye": self.light_eye,
        }

        from .optim import get_optimizer, make_lr_schedule

        self.steps_per_epoch = max(1, len(items) // max(1, cfg.batch_size))
        self.schedule = make_lr_schedule(
            cfg.lr, cfg.lr_scheduler, self.steps_per_epoch, cfg.num_epochs,
            cfg.decay_step, cfg.decay_gamma, cfg.poly_exp,
            cfg.warmup_multiplier, cfg.warmup_epochs, cfg.optimizer,
        )
        self.optimizer = get_optimizer(
            cfg.optimizer, self.schedule, cfg.momentum, cfg.weight_decay,
            grad_clip=cfg.grad_clip,
        )
        self.rng, kp = jax.random.split(self.rng)
        self.params = init_params(cfg, kp)
        self.opt_state = self.optimizer.init(self.params)
        self.ckpt_root = os.path.join(cfg.ckpt_dir, cfg.exp_name)
        self._step = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        rkw = _sigma_render_kwargs(cfg, cfg.N_importance)
        fine = cfg.N_importance > 0
        image_shape = tuple(cfg.img_wh)
        Bi = max(1, cfg.batch_size)
        optimizer = self.optimizer
        mesh = self.mesh

        # light tables are passed as ARGUMENTS, never closed over: arrays
        # captured by a jitted closure become program constants and blow the
        # remote-compile upload limit at real resolutions (CLAUDE.md gotcha)
        def device_step(
            params, opt_state, rays_flat, rgbs_b, cam_ms_b, cam_eyes_b,
            light, key,
        ):
            # rays_flat/light["rays"] arrive as this device's row shard;
            # everything else replicated
            dev = jax.lax.axis_index("rays")

            def loss_fn(params):
                kc, kl = jax.random.split(jax.random.fold_in(key, dev))
                cam_res = render_rays(
                    params.get("coarse"), params.get("fine"), rays_flat, kc,
                    **rkw,
                )
                light_res = render_rays(
                    params.get("coarse"), params.get("fine"), light["rays"],
                    kl, **rkw,
                )

                def gather(x):
                    return jax.lax.all_gather(x, "rays", tiled=True)

                cam_depths = {
                    k: gather(v) for k, v in cam_res.items()
                    if k.startswith("depth")
                }
                light_tiled = {
                    k: jnp.tile(gather(v), (Bi,))
                    for k, v in light_res.items() if k.startswith("depth")
                }
                out = shadow_mapping_images(
                    cam_depths, light_tiled, cam_ms_b, cam_eyes_b,
                    light["m"], light["eye"], image_shape, Bi,
                    fine_sampling=fine, shadow_method=cfg.shadow_method,
                )
                targets = rgbs_b.reshape(-1, 3)
                loss = mse_loss(out, targets)
                typ = "fine" if fine else "coarse"
                return loss, psnr_metric(out[f"rgb_{typ}"], targets)

            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            # each device differentiated its own copy of the replicated
            # loss; the all_gather transpose (psum_scatter) therefore
            # carries a factor of D on every shard's cotangent, and pmean
            # — not psum — recovers the exact full-batch gradient
            grads = jax.lax.pmean(grads, "rays")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, psnr

        fn = shard_map(
            device_step,
            mesh,
            in_specs=(
                P(), P(), P("rays"), P(), P(), P(),
                {"rays": P("rays"), "m": P(), "eye": P()}, P(),
            ),
            out_specs=(P(), P(), P(), P()),
        )
        return jax.jit(fn, donate_argnums=(0, 1))

    def validation(self, epoch: int, max_images: Optional[int] = None):
        """Whole-image validation (reference ``train_shadow_mapping.py``
        ``validation_step``, ``:153-196``): render camera AND light depth
        images, composite with the per-image shadow-mapping pipeline
        (eval batch size is always 1, ``:167``), log val loss/PSNR and dump
        gt/rgb/depth PNGs for the first frame."""
        cfg = self.cfg
        rkw = _sigma_render_kwargs(cfg, cfg.N_importance, train=False)
        fine = cfg.N_importance > 0
        n_img = len(self.val_dataset)
        if max_images is not None:
            n_img = min(n_img, max_images)
        losses, psnrs = [], []
        light_depths = None  # one light rig: render its depths once
        for i in range(n_img):
            sample = self.val_dataset[i]
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            cam_res = render_image(
                self.params, jnp.asarray(sample["rays"]), k1,
                chunk=cfg.chunk, mesh=self.mesh, **rkw,
            )
            if light_depths is None:
                light_res = render_image(
                    self.params, self.light_rays, k2, chunk=cfg.chunk,
                    mesh=self.mesh, **rkw,
                )
                light_depths = {
                    k: jnp.asarray(v)
                    for k, v in light_res.items()
                    if k.startswith("depth")
                }
            out = _shadow_mapping_images_val(
                {k: jnp.asarray(v) for k, v in cam_res.items()},
                light_depths,
                jnp.asarray(sample["ppc"]["camera"])[None],
                jnp.asarray(sample["ppc"]["eye_pos"])[None],
                self.light_m, self.light_eye, image_shape=tuple(cfg.img_wh),
                batch_size=1, fine_sampling=fine,
                shadow_method=cfg.shadow_method,
            )
            rgbs = jnp.asarray(sample["rgbs"])
            _sync_if_cpu(out)
            typ = "fine" if "rgb_fine" in out else "coarse"
            loss_i, psnr_i = _val_scalars(out, rgbs, typ)
            losses.append(loss_i)
            psnrs.append(psnr_i)
            if i == 0:
                dump_val_images(
                    self.logger, cfg, epoch * self.steps_per_epoch, epoch,
                    out, rgbs, typ,
                )
        loss, psnr = _fetch_means(losses, psnrs)
        return {
            "val/loss": loss,
            "val/psnr": psnr,
        }

    def fit(self):
        cfg = self.cfg
        Bi = max(1, cfg.batch_size)
        n = self.rays.shape[0]
        global_step = 0
        from .checkpoints import save_checkpoint

        # preemption-safe save (standalone class — no NeRFSystem prologue)
        from ..utils.profiling import install_preemption_handler

        self._last_epoch = 0

        def _preempt_save():
            os.makedirs(self.ckpt_root, exist_ok=True)
            save_checkpoint(
                os.path.join(self.ckpt_root, "preempt.ckpt"),
                {"params": jax.device_get(self.params),
                 "opt_state": jax.device_get(self.opt_state),
                 "epoch": self._last_epoch},
            )

        install_preemption_handler(_preempt_save)
        if cfg.debug_nans:
            from ..utils.profiling import enable_nan_debugging

            enable_nan_debugging(True)

        if cfg.num_sanity_val_steps > 0:
            print(f"[sanity] {self.validation(0, max_images=cfg.num_sanity_val_steps)}")
        for epoch in range(cfg.num_epochs):
            self._last_epoch = epoch
            losses, psnrs = [], []
            t0 = time.time()
            for s in range(self.steps_per_epoch):
                idx = np.asarray([(s * Bi + k) % n for k in range(Bi)])
                self.rng, key = jax.random.split(self.rng)
                self.params, self.opt_state, loss, psnr = self._step(
                    self.params, self.opt_state,
                    self.rays[idx].reshape(-1, 8),
                    self.rgbs[idx], self.cam_ms[idx], self.cam_eyes[idx],
                    self.light_tables, key,
                )
                # keep device scalars: a float() here would pay one blocking
                # tunnel round trip PER STEP; one device_get per epoch below
                losses.append(loss)
                psnrs.append(psnr)
            global_step += self.steps_per_epoch
            losses, psnrs = _fetch_means(losses, psnrs)
            self.logger.scalars(
                global_step,
                {"train/loss": losses, "train/psnr": psnrs},
            )
            msg = (
                f"epoch {epoch}: loss {losses:.5f} "
                f"psnr {psnrs:.2f} ({time.time()-t0:.1f}s)"
            )
            if (epoch + 1) % cfg.val_every_n_epochs == 0 or epoch == cfg.num_epochs - 1:
                vm = self.validation(epoch)
                self.logger.scalars(global_step, vm)
                msg += f" | val loss {vm['val/loss']:.5f} psnr {vm['val/psnr']:.2f}"
            print(msg, flush=True)
            os.makedirs(self.ckpt_root, exist_ok=True)
            save_checkpoint(
                os.path.join(self.ckpt_root, f"epoch={epoch}.ckpt"),
                {"params": jax.device_get(self.params),
                 "opt_state": jax.device_get(self.opt_state),
                 "epoch": epoch},
            )
        self.logger.close()
        return self.params


class ShadowsSystem(NeRFSystem):
    """RGB NeRF training on shadow datasets (reference ``train_shadows.py``
    — the vanilla loop pointed at the shadow loaders; effectively trains the
    radiance field to reproduce the sm images).

    The reference additionally passes Lightning ``auto_scale_batch_size=True``
    (``train_shadows.py:229``) — a GPU OOM-search that is intentionally not
    reproduced: TPU programs are static-shape (a batch search would compile
    one program per probe) and the flagship batch sizes here use a few
    hundred MB of a 16 GB chip, so the search could only ever return the
    configured batch."""

    def _prepare_data(self):
        cfg = self.cfg
        _reject_per_host_data(cfg, type(self).__name__)
        ds_cls = dataset_dict[cfg.dataset_name]
        kw = dict(root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh))
        self.train_dataset = ds_cls(split="train", **kw)
        self.val_dataset = ds_cls(split="val", **kw)
        self.white_back = self.train_dataset.white_back
        if hasattr(self.train_dataset, "all_rays"):
            rays = self.train_dataset.all_rays
            rgbs = self.train_dataset.all_rgbs
        else:  # per-image datasets: flatten every image into the ray buffer
            items = [
                self.train_dataset[i] for i in range(len(self.train_dataset))
            ]
            rays = np.concatenate([it["rays"] for it in items], 0)
            rgbs = np.concatenate([it["rgbs"] for it in items], 0)
        # keep the host copies only when --global_reshuffle will re-shard
        # from them (the per-image branch's buffers are FRESH concatenations
        # — retaining them unconditionally would pin GBs at production
        # scale; with all_rays they're references the dataset holds anyway)
        if cfg.global_reshuffle:
            self._host_rays, self._host_rgbs = rays, rgbs
        self.rays_buf = shard_rays(rays, self.mesh)
        self.rgbs_buf = shard_rays(rgbs, self.mesh)
