"""EXECUTED multi-host test (VERDICT.md round-1 item #2).

Round 1 wrote the multi-process branches (``parallel/mesh.py``'s global-array
assembly, process-0 checkpoint/log gating) but never ran them; a bug there
silently trains N divergent models.  This test spawns 2 REAL processes
(``jax.distributed.initialize`` on CPU, 4 virtual devices each -> one
8-device global mesh with Gloo cross-process collectives) running the actual
``NeRFSystem.fit`` on a shared tiny scene, then asserts:

  * ``shard_rays`` builds the correct global array in BOTH source layouts
    (full buffer on every host / per-host subsets) — asserted in-worker;
  * both processes finish with IDENTICAL parameters (DDP invariant);
  * exactly ONE process wrote metrics.jsonl and the checkpoints
    (``logging.py`` / ``checkpoints.py`` process-0 gating).

Kept intentionally small: the host is 2-core and XLA:CPU's 40 s collective
rendezvous watchdog aborts starved runs (CLAUDE.md gotcha), so 16x16 scene,
batch 32, 2 epochs.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training(blender_root, shadow_root, tmp_path):
    work = str(tmp_path)
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(blender_root),
             work, str(shadow_root)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    # identical final params across processes
    results = []
    for pid in (0, 1):
        with open(os.path.join(work, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    assert results[0]["ok"] and results[1]["ok"]
    assert results[0]["digest"] == results[1]["digest"]
    # flagship shadow trainer too: identical params across processes
    assert results[0]["sm_digest"] is not None
    assert results[0]["sm_digest"] == results[1]["sm_digest"]
    # per-host data loading (--per_host_data): hosts read DIFFERENT image
    # subsets yet converge to identical params
    assert results[0]["ph_digest"] is not None
    assert results[0]["ph_digest"] == results[1]["ph_digest"]

    # exactly one process logged (4 records: 2 epochs x train+val scalars)
    metrics = os.path.join(work, "logs", "mp", "metrics.jsonl")
    assert os.path.exists(metrics)
    with open(metrics) as f:
        records = [json.loads(l) for l in f if l.strip()]
    steps = [r["step"] for r in records if "train/loss" in r]
    assert len(steps) == len(set(steps)) == 2, (
        f"duplicate/odd train records (two writers?): {records}"
    )
    assert sum(1 for r in records if "val/loss" in r) == 2

    # exactly one set of checkpoints, resumable
    ckpts = sorted(os.listdir(os.path.join(work, "ckpts", "mp")))
    assert ckpts == ["epoch=0.ckpt", "epoch=1.ckpt"], ckpts

    from nerf_pl_tpu.training import checkpoints

    state = checkpoints.load_checkpoint(
        os.path.join(work, "ckpts", "mp", "epoch=1.ckpt")
    )
    assert int(state["epoch"]) == 1


def test_two_process_shadow_trainers(shadow_root, tmp_path):
    """The remaining three sharded trainers under REAL 2-process Gloo
    collectives (VERDICT round-2 next #1): RGBSM with gradients through the
    sharded light-cache all_gather, LightSampler's get_K + sampled light
    render, and ShadowMapping's all_gather'd whole-image composite — all
    must end with identical params on both processes (the DDP invariant,
    reference train.py:174-175)."""
    work = str(tmp_path)
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(shadow_root),
             work, str(shadow_root), "shadow3"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for pid in (0, 1):
        with open(os.path.join(work, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    assert results[0]["ok"] and results[1]["ok"]
    for key in ("rgbsm", "light_sampler", "shadow_mapping",
                "efficient_sm_per_host"):
        assert results[0][key] is not None, key
        assert results[0][key] == results[1][key], key


def test_three_process_uneven_shards(blender_root4, shadow_root4, tmp_path):
    """3 processes x 2 virtual devices with 4-frame scenes: frames[p::3]
    shards UNEVENLY (2/1/1), so the DistributedSampler-style wrap-pad AND
    the white_pix row-equalization (round-3 commit 797aec2) reconcile three
    DIFFERENT per-host shapes for the first time (VERDICT r3 next #4).
    All three processes must converge to identical params."""
    work = str(tmp_path)
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["MP_NPROC"] = "3"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port),
             str(blender_root4), work, str(shadow_root4), "uneven3"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1, 2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for pid in (0, 1, 2):
        with open(os.path.join(work, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    assert all(r["ok"] for r in results)
    for key in ("nerf_per_host_reshuffle", "efficient_sm_per_host"):
        vals = [r[key] for r in results]
        assert vals[0] is not None, key
        assert vals[0] == vals[1] == vals[2], (key, vals)
