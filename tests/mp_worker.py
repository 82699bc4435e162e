"""Worker process for test_multiprocess.py — NOT a pytest module.

Runs the REAL ``NeRFSystem`` under ``jax.distributed`` (2 processes x 4
virtual CPU devices = an 8-device global mesh) and asserts, from inside the
distributed program, the properties VERDICT.md round-1 item #2 demanded:

  * ``shard_rays``'s ``process_count > 1`` branch assembles the correct
    GLOBAL array (every source row exactly once, in order);
  * a full ``fit()`` (epoch program + validation render + checkpoint/logging
    gating) executes;
  * the final params digest is written out so the parent can assert both
    processes hold IDENTICAL weights (the reference's DDP invariant,
    train.py:174-175).

Round 3 adds a second stage covering the remaining three sharded trainers
(VERDICT round-2 next #1): ``RGBSMSystem`` with ``--grad_on_light`` (gradients
THROUGH the sharded light-cache all_gather — the psum_scatter transpose),
``LightSamplerSystem`` (get_K projection + sampled light render), and
``ShadowMappingSystem`` (all_gather'd whole-image depth composite), each
asserted to identical cross-process param digests.

Round 4 adds the ``uneven3`` stage (VERDICT round-3 next #4): a 3-process
run (``MP_NPROC=3``, 2 virtual devices each) where ``frames[pid::3]`` on a
4-frame scene shards UNEVENLY (2/1/1) — the first real exercise of the
wrap-pad + per-host row-equalization landed in round 3 (commit 797aec2) at
a process count where the padding actually differs per host.

Usage: python mp_worker.py <process_id> <port> <scene_dir> <work_dir> \
           [shadow_scene] [stage]
``stage`` ∈ {core (default), shadow3, uneven3};
``MP_NPROC`` env sets the process count (default 2).
"""
import hashlib
import json
import os
import sys


def digest_of(tree):
    import jax
    import numpy as np

    return hashlib.sha256(
        b"".join(
            np.ascontiguousarray(l).tobytes()
            for l in jax.tree_util.tree_leaves(jax.device_get(tree))
        )
    ).hexdigest()


def run_shadow3(work, shadow_scene, pid):
    """The three shadow trainers that round 2 only ever ran single-process."""
    from nerf_pl_tpu.config import Config
    from nerf_pl_tpu.training.shadow_systems import (
        LightSamplerSystem,
        RGBSMSystem,
        ShadowMappingSystem,
    )

    base = dict(
        root_dir=shadow_scene, img_wh=(8, 8), N_samples=4, N_importance=4,
        batch_size=8, num_epochs=1, chunk=128, lr=1e-3, noise_std=0.0,
        Light_N_importance=0, sample_light_depth_every=2,
        log_dir=os.path.join(work, "logs"),
        ckpt_dir=os.path.join(work, "ckpts"), num_sanity_val_steps=0,
        use_fused_mlp=False, compilation_cache=False,
    )
    digests = {}
    # joint RGB+SM with gradients through the sharded light cache
    cfg = Config(dataset_name="rgb_sm", exp_name="mp_rgbsm",
                 grad_on_light=True, **base)
    sysm = RGBSMSystem(cfg)
    assert sysm.shard_light, "light render must shard to cover the collective"
    digests["rgbsm"] = digest_of(sysm.fit())
    print(f"[worker {pid}] rgbsm done", flush=True)

    cfg = Config(dataset_name="efficient_sm", exp_name="mp_lsamp", **base)
    digests["light_sampler"] = digest_of(LightSamplerSystem(cfg).fit())
    print(f"[worker {pid}] light_sampler done", flush=True)

    cfg = Config(dataset_name="shadows", exp_name="mp_smimg",
                 **{**base, "batch_size": 1})
    digests["shadow_mapping"] = digest_of(ShadowMappingSystem(cfg).fit())
    print(f"[worker {pid}] shadow_mapping done", flush=True)

    # flagship per-host loading (VERDICT round-2 next #6): each host reads
    # only kept-frames[pid::2] (wrap-padded 2-vs-2 on the 3-frame scene),
    # pose tables full everywhere — identical params must still fall out
    from nerf_pl_tpu.training.shadow_systems import EfficientSMSystem

    # white_pix makes the per-ray filter CONTENT-dependent: hosts keep
    # different row counts even after wrap-padded frame shards, so this
    # exercises the allgather row-equalization (review round 3)
    cfg = Config(dataset_name="efficient_sm", exp_name="mp_sm_ph",
                 per_host_data=True, white_pix=0.4, **base)
    ph = EfficientSMSystem(cfg)
    n_frames = ph.num_poses  # full pose table despite the local subset
    assert n_frames == 3, n_frames
    # wrap-padded to ceil(3/2)=2 frames, then white_pix-filtered
    assert ph.train_dataset.all_rays.shape[0] <= 2 * 8 * 8
    # equalized: the GLOBAL buffer divides evenly with no host's rays
    # beyond the sub-device remainder truncated
    assert ph.rays_buf.shape[0] % ph.mesh.devices.size == 0
    digests["efficient_sm_per_host"] = digest_of(ph.fit())
    print(f"[worker {pid}] efficient_sm per-host done", flush=True)

    with open(os.path.join(work, f"result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "ok": True, **digests}, f)


def run_uneven3(work, scene, shadow_scene, pid, nproc):
    """3-process uneven-shard matrix: frames[pid::3] on 4-frame scenes."""
    import jax
    import numpy as np

    from nerf_pl_tpu.config import Config
    from nerf_pl_tpu.training.shadow_systems import EfficientSMSystem
    from nerf_pl_tpu.training.trainer import NeRFSystem

    digests = {}
    n_dev = jax.device_count()

    # vanilla trainer, per-host frames + per-epoch global reshuffle
    cfg = Config(
        root_dir=scene, dataset_name="blender", img_wh=(16, 16),
        N_samples=4, N_importance=4, batch_size=24, num_epochs=2,
        chunk=256, lr=5e-3, blender_near=2.0, blender_far=6.0,
        white_back=True, exp_name="mp_u3",
        log_dir=os.path.join(work, "logs"),
        ckpt_dir=os.path.join(work, "ckpts"), num_sanity_val_steps=0,
        use_fused_mlp=False, compilation_cache=False, per_host_data=True,
        global_reshuffle=True,
    )
    ph = NeRFSystem(cfg)
    # 4 frames over 3 hosts: every host wrap-pads to ceil(4/3)=2 frames
    assert ph.train_dataset.all_rays.shape[0] == 2 * 16 * 16, (
        ph.train_dataset.all_rays.shape
    )
    digests["nerf_per_host_reshuffle"] = digest_of(ph.fit())
    print(f"[worker {pid}] uneven3 nerf done", flush=True)

    # efficient_sm per-host with a CONTENT-dependent row filter: hosts hold
    # different ray counts even after the frame wrap-pad, so the allgather
    # row-equalization must reconcile 3 distinct counts
    cfg = Config(
        root_dir=shadow_scene, dataset_name="efficient_sm",
        img_wh=(8, 8), N_samples=4, N_importance=0, batch_size=12,
        num_epochs=1, chunk=128, lr=1e-3, noise_std=0.0,
        Light_N_importance=0, sample_light_depth_every=2,
        exp_name="mp_u3_sm", log_dir=os.path.join(work, "logs"),
        ckpt_dir=os.path.join(work, "ckpts"), num_sanity_val_steps=0,
        use_fused_mlp=False, compilation_cache=False, per_host_data=True,
        white_pix=0.4,
    )
    sm = EfficientSMSystem(cfg)
    assert sm.num_poses == 4, sm.num_poses  # full pose table everywhere
    assert sm.rays_buf.shape[0] % n_dev == 0
    digests["efficient_sm_per_host"] = digest_of(sm.fit())
    print(f"[worker {pid}] uneven3 efficient_sm done", flush=True)

    with open(os.path.join(work, f"result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "ok": True, **digests}, f)


def main():
    pid, port, scene, work = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    )
    stage = sys.argv[6] if len(sys.argv) > 6 else "core"
    nproc = int(os.environ.get("MP_NPROC", "2"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc

    import numpy as np

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_pl_tpu.config import Config
    from nerf_pl_tpu.parallel.mesh import make_mesh, shard_rays
    from nerf_pl_tpu.training.trainer import NeRFSystem

    if stage == "shadow3":
        run_shadow3(work, sys.argv[5], pid)
        print(f"[worker {pid}] shadow3 done", flush=True)
        return

    if stage == "uneven3":
        run_uneven3(work, scene, sys.argv[5], pid, nproc)
        print(f"[worker {pid}] uneven3 done", flush=True)
        return

    # the original 2-process stages assume the 2x4-device layout
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    # --- shard_rays global-buffer assembly (both layouts) -------------------
    mesh = make_mesh()
    src = np.arange(33 * 2, dtype=np.float32).reshape(33, 2)
    arr = shard_rays(src, mesh)  # truncates to 32 rows over 8 devices
    gathered = np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(arr)
    )
    np.testing.assert_array_equal(gathered, src[:32])
    # per-host subset layout: host p contributes rows p::2
    local_rows = src[:32][pid::2]
    arr_l = shard_rays(local_rows, mesh, local=True)
    gathered_l = np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(arr_l)
    )
    assert gathered_l.shape == (32, 2)
    # every contributed row appears exactly once (order is host-interleaved)
    assert {tuple(r) for r in gathered_l} == {tuple(r) for r in src[:32]}

    # --- the real trainer ----------------------------------------------------
    cfg = Config(
        root_dir=scene, dataset_name="blender", img_wh=(16, 16),
        N_samples=8, N_importance=8, batch_size=32, num_epochs=2,
        chunk=256, lr=5e-3, blender_near=2.0, blender_far=6.0,
        white_back=True, exp_name="mp", log_dir=os.path.join(work, "logs"),
        ckpt_dir=os.path.join(work, "ckpts"), num_sanity_val_steps=1,
        val_every_n_epochs=1, use_fused_mlp=False, compilation_cache=False,
    )
    system = NeRFSystem(cfg)
    assert system.mesh.devices.size == 8

    # the device-resident buffer holds the dataset rows exactly once
    gathered = np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(system.mesh, P()))(
            system.rays_buf
        )
    )
    n = gathered.shape[0]
    np.testing.assert_allclose(
        gathered, system.train_dataset.all_rays[:n], rtol=0, atol=0
    )

    params = system.fit()
    digest = digest_of(params)

    # --- collective val-cache decision (ADVICE r4) --------------------------
    # one host failing to stack its val set must disable the batched val
    # program on EVERY host — a per-host decision would diverge the
    # collective program set and the rng split count in fit() and hang
    assert system._val_fn is not None  # the healthy fit() installed it
    if pid == 1:
        class _Boom:
            def __len__(self):
                raise OSError("val load failed on this host")

        system.val_dataset = _Boom()
    system._prepare_val_cache()
    assert system._val_fn is None, "val-cache fallback must be collective"

    # --- per-host data loading (pod-scale pipeline, SURVEY.md §7) -----------
    # each process loads only frames[pid::2]; with 3 train frames the raw
    # subsets are unbalanced (2 vs 1) and the loader wrap-pads the smaller
    # host (DistributedSampler semantics) so no frame is truncated away
    ph_cfg = Config(
        root_dir=scene, dataset_name="blender", img_wh=(16, 16),
        N_samples=8, N_importance=8, batch_size=16, num_epochs=1,
        chunk=256, lr=5e-3, blender_near=2.0, blender_far=6.0,
        white_back=True, exp_name="mp_ph", log_dir=os.path.join(work, "logs"),
        ckpt_dir=os.path.join(work, "ckpts"), num_sanity_val_steps=0,
        use_fused_mlp=False, compilation_cache=False, per_host_data=True,
    )
    ph = NeRFSystem(ph_cfg)
    full = system.train_dataset.all_rays  # the full buffer (first run)
    n_frames = full.shape[0] // (16 * 16)
    # DistributedSampler-style wrap (round 3): every host holds
    # ceil(n_frames/2) frames — the smaller host repeats its leading frame
    # so shard_rays(local=True)'s global-MIN truncation drops NOTHING
    target = -(-n_frames // 2)
    assert ph.train_dataset.all_rays.shape[0] == target * 16 * 16
    g = np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(ph.mesh, P()))(
            ph.rays_buf
        )
    )
    per_dev = (target * 16 * 16) // 4
    assert g.shape[0] == 8 * per_dev, (g.shape, per_dev)
    full_set = {r.tobytes() for r in full}
    g_rows = [r.tobytes() for r in g]
    # every row comes from the source dataset AND every dataset row is on
    # device (wrapped frames legitimately appear twice)
    assert set(g_rows) == full_set
    ph_digest = digest_of(ph.fit())

    # --- the flagship shadow trainer, multi-process -------------------------
    # (exercises _ShadowSystemBase's sharded pixel/pose buffers, the light-
    # cache scan carry and the efficient_sm compositor under cross-process
    # collectives)
    sm_digest = None
    shadow_scene = sys.argv[5] if len(sys.argv) > 5 else None
    if shadow_scene:
        from nerf_pl_tpu.training.shadow_systems import EfficientSMSystem

        sm_cfg = Config(
            root_dir=shadow_scene, dataset_name="efficient_sm",
            img_wh=(8, 8), N_samples=4, N_importance=4, batch_size=8,
            num_epochs=1, chunk=128, lr=1e-3, noise_std=0.0,
            Light_N_importance=0, sample_light_depth_every=2,
            exp_name="mp_sm", log_dir=os.path.join(work, "logs"),
            ckpt_dir=os.path.join(work, "ckpts"), num_sanity_val_steps=0,
            use_fused_mlp=False, compilation_cache=False,
        )
        sm_system = EfficientSMSystem(sm_cfg)
        sm_params = sm_system.fit()
        sm_digest = digest_of(sm_params)

    with open(os.path.join(work, f"result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "digest": digest, "sm_digest": sm_digest,
                   "ph_digest": ph_digest, "ok": True}, f)
    print(f"[worker {pid}] done digest={digest[:12]}", flush=True)


if __name__ == "__main__":
    main()
