"""Full trainer-state checkpoint migration (VERDICT round-2 missing #1).

The reference resumes mid-training with optimizer moments + epoch/schedule
position (``/root/reference/train.py:169`` ``resume_from_checkpoint``;
Lightning ckpts carry ``optimizer_states``/``epoch``).  These tests prove the
migration is TRAJECTORY-EXACT in both directions, in the style of
``test_reference_convergence.py``:

  * forward:  N steps of the reference's own trainer math (render_rays +
    MSELoss + torch.optim.Adam) → fabricate the Lightning-0.7.5 trainer ckpt
    → ``import_full_checkpoint`` → N more steps HERE ≈ 2N reference steps;
  * reverse:  N steps here → ``export_full_checkpoint`` → the reference's
    modules + Adam load the state dicts → N more torch steps ≈ 2N of ours;
  * round-trip: import(export(ckpt)) preserves params, moments, step, epoch;
  * trainer integration: ``NeRFSystem`` resumes from an imported ckpt at the
    right epoch with the right Adam count.

Lightning-0.7.5 key conventions (``'epoch'``/``'global_step'`` saved ``+1``,
i.e. the NEXT epoch to run) are fabricated here exactly as documented in
``import_full_checkpoint``'s docstring.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

torch = pytest.importorskip("torch")

from reference_harness import load_reference, params_to_ref_nerf

from nerf_pl_tpu.data.blender import BlenderDataset
from nerf_pl_tpu.models.nerf import init_nerf
from nerf_pl_tpu.ops.rendering import render_rays
from nerf_pl_tpu.tools.import_torch_ckpt import (
    export_full_checkpoint,
    import_full_checkpoint,
    params_from_torch_checkpoint,
)
from nerf_pl_tpu.training import checkpoints
from nerf_pl_tpu.training.optim import get_optimizer

LR = 5e-4
BATCH = 128
NS = 8
N_STEPS = 30  # per phase


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def ray_buffer(blender_root):
    ds = BlenderDataset(str(blender_root), "train", img_wh=(16, 16),
                        near=2.0, far=6.0, white_back=True)
    perm = np.random.RandomState(0).permutation(len(ds.all_rays))
    return ds.all_rays[perm], ds.all_rgbs[perm]


def _batches(rays, rgbs, start, steps):
    n = rays.shape[0]
    for s in range(start, start + steps):
        lo = (s * BATCH) % (n - BATCH + 1)
        yield rays[lo:lo + BATCH], rgbs[lo:lo + BATCH]


# -- one deterministic coarse-only train step on each side -------------------
def _torch_steps(ref, model, topt, rays_all, rgbs_all, start, steps):
    embeddings = [ref.nerf.Embedding(3, 10), ref.nerf.Embedding(3, 4)]
    criterion = ref.losses.MSELoss()
    losses = []
    for rays, rgbs in _batches(rays_all, rgbs_all, start, steps):
        res = ref.rendering.render_rays(
            [model], embeddings, torch.from_numpy(rays), N_samples=NS,
            perturb=0.0, noise_std=0.0, N_importance=0, white_back=True,
        )
        loss = criterion(res, torch.from_numpy(rgbs))
        topt.zero_grad()
        loss.backward()
        topt.step()
        losses.append(float(loss))
    return losses


def _jax_step_fn(opt):
    @jax.jit
    def step(params, opt_state, rays, rgbs):
        def loss_fn(p):
            r = render_rays(p["coarse"], None, rays, None, N_samples=NS,
                            N_importance=0, perturb=0.0, noise_std=0.0,
                            white_back=True, mode="rgb")
            return jnp.mean((r["rgb_coarse"] - rgbs) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def _jax_steps(step, params, opt_state, rays_all, rgbs_all, start, steps):
    losses = []
    for rays, rgbs in _batches(rays_all, rgbs_all, start, steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(rays), jnp.asarray(rgbs)
        )
        losses.append(float(loss))
    return params, opt_state, losses


def _lightning_ckpt(model, topt, epoch_next, global_step):
    """Fabricate exactly what PL 0.7.5 dump_checkpoint writes (its +1 key
    conventions), from live torch objects."""
    return {
        "epoch": epoch_next,            # current_epoch + 1
        "global_step": global_step + 1,  # PL 0.7.5 off-by-one wart
        "state_dict": {
            f"nerf_coarse.{k}": v for k, v in model.state_dict().items()
        },
        "optimizer_states": [topt.state_dict()],
        "lr_schedulers": [],
    }


def _assert_tree_close(a, b, rtol, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def test_import_full_state_continues_reference_trajectory(
    ref, ray_buffer, tmp_path
):
    """reference N steps → migrate → N steps here == reference 2N steps."""
    rays_all, rgbs_all = ray_buffer
    params0 = init_nerf(jax.random.PRNGKey(0), D=4, W=32)

    # --- reference side: 2N steps, checkpointing at N ----------------------
    model = params_to_ref_nerf(params0, ref.nerf.NeRF, requires_grad=True)
    topt = torch.optim.Adam(model.parameters(), lr=LR, eps=1e-8)
    _torch_steps(ref, model, topt, rays_all, rgbs_all, 0, N_STEPS)
    ckpt = _lightning_ckpt(model, topt, epoch_next=3, global_step=N_STEPS)
    torch_path = str(tmp_path / "ref_trainer.ckpt")
    torch.save(ckpt, torch_path)
    ref_losses_2 = _torch_steps(
        ref, model, topt, rays_all, rgbs_all, N_STEPS, N_STEPS
    )

    # --- migrate ------------------------------------------------------------
    our_path = str(tmp_path / "migrated.ckpt")
    state = import_full_checkpoint(torch_path, our_path)
    assert state["epoch"] == 2  # PL 'epoch' is next-to-run: 3 - 1
    assert int(np.asarray(state["opt_state"][0].count)) == N_STEPS

    # --- continue here through the SAVED ckpt (full restore path) ----------
    opt = get_optimizer("adam", lambda step: LR)
    target = {
        "params": {"coarse": params0},
        "opt_state": opt.init({"coarse": params0}),
        "epoch": 0,
    }
    restored = checkpoints.load_checkpoint(our_path, target)
    step = _jax_step_fn(opt)
    params, opt_state, our_losses_2 = _jax_steps(
        step, restored["params"], restored["opt_state"],
        rays_all, rgbs_all, N_STEPS, N_STEPS,
    )

    np.testing.assert_allclose(
        np.array(our_losses_2), np.array(ref_losses_2), rtol=5e-3, atol=1e-6
    )
    ref_params_final = params_from_torch_checkpoint(
        {k: v for k, v in model.state_dict().items()}
    )
    _assert_tree_close(
        params["coarse"], ref_params_final["coarse"], rtol=1e-2, atol=1e-4
    )


def test_export_full_state_continues_our_trajectory(ref, ray_buffer, tmp_path):
    """ours N steps → export → reference N steps == ours 2N steps."""
    rays_all, rgbs_all = ray_buffer
    params0 = {"coarse": init_nerf(jax.random.PRNGKey(1), D=4, W=32)}

    opt = get_optimizer("adam", lambda step: LR)
    step = _jax_step_fn(opt)
    params, opt_state, _ = _jax_steps(
        step, params0, opt.init(params0), rays_all, rgbs_all, 0, N_STEPS
    )
    our_path = str(tmp_path / "ours_full.ckpt")
    checkpoints.save_checkpoint(
        our_path,
        {"params": jax.device_get(params),
         "opt_state": jax.device_get(opt_state), "epoch": 4},
    )
    params2, _, our_losses_2 = _jax_steps(
        step, params, opt_state, rays_all, rgbs_all, N_STEPS, N_STEPS
    )

    # --- export + reference resume -----------------------------------------
    torch_path = str(tmp_path / "exported_trainer.ckpt")
    export_full_checkpoint(our_path, torch_path, lr=LR)
    ckpt = torch.load(torch_path, map_location="cpu", weights_only=True)
    assert ckpt["epoch"] == 5  # ours-last-completed 4 → PL next-to-run 5

    # skips=[4] is a no-op at D=4 — matches init_nerf(D=4)'s skipless layout
    model = ref.nerf.NeRF(D=4, W=32, in_channels_xyz=63, in_channels_dir=27,
                          skips=[4])
    model.load_state_dict({
        k[len("nerf_coarse."):]: v
        for k, v in ckpt["state_dict"].items()
        if k.startswith("nerf_coarse.")
    })
    for p in model.parameters():
        p.requires_grad_(True)
    topt = torch.optim.Adam(model.parameters(), lr=LR, eps=1e-8)
    topt.load_state_dict(ckpt["optimizer_states"][0])
    ref_losses_2 = _torch_steps(
        ref, model, topt, rays_all, rgbs_all, N_STEPS, N_STEPS
    )

    np.testing.assert_allclose(
        np.array(ref_losses_2), np.array(our_losses_2), rtol=5e-3, atol=1e-6
    )
    ref_params_final = params_from_torch_checkpoint(
        {k: v for k, v in model.state_dict().items()}
    )
    _assert_tree_close(
        params2["coarse"], ref_params_final["coarse"], rtol=1e-2, atol=1e-4
    )


def test_full_state_round_trip(ref, ray_buffer, tmp_path):
    """import(export(state)) preserves params, moments, step and epoch."""
    rays_all, rgbs_all = ray_buffer
    params0 = {"coarse": init_nerf(jax.random.PRNGKey(2), D=2, W=16),
               "fine": init_nerf(jax.random.PRNGKey(3), D=2, W=16)}
    opt = get_optimizer("adam", lambda step: LR)

    @jax.jit
    def step(params, opt_state, rays, rgbs):
        def loss_fn(p):
            r = render_rays(p["coarse"], p["fine"], rays,
                            jax.random.PRNGKey(7), N_samples=NS,
                            N_importance=4, perturb=0.0, noise_std=0.0,
                            white_back=True, mode="rgb")
            return (jnp.mean((r["rgb_coarse"] - rgbs) ** 2)
                    + jnp.mean((r["rgb_fine"] - rgbs) ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = params0, opt.init(params0)
    for rays, rgbs in _batches(rays_all, rgbs_all, 0, 3):
        params, opt_state, _ = step(
            params, opt_state, jnp.asarray(rays), jnp.asarray(rgbs)
        )

    a = str(tmp_path / "a.ckpt")
    checkpoints.save_checkpoint(
        a, {"params": jax.device_get(params),
            "opt_state": jax.device_get(opt_state), "epoch": 7},
    )
    b = str(tmp_path / "b.ckpt")  # torch side
    export_full_checkpoint(a, b, lr=LR)
    c = str(tmp_path / "c.ckpt")  # back to ours
    state = import_full_checkpoint(b, c)

    assert state["epoch"] == 7
    assert int(np.asarray(state["opt_state"][0].count)) == 3
    _assert_tree_close(state["params"], params, rtol=0, atol=1e-7)
    _assert_tree_close(state["opt_state"][0].mu, opt_state[0].mu,
                       rtol=0, atol=1e-7)
    _assert_tree_close(state["opt_state"][0].nu, opt_state[0].nu,
                       rtol=0, atol=1e-7)


def test_trainer_resumes_imported_full_state(ref, blender_root, tmp_path):
    """NeRFSystem's resume path accepts an imported reference trainer ckpt:
    right epoch0, right Adam count, right weights."""
    params0 = init_nerf(jax.random.PRNGKey(4))  # trainer default arch D8/W256
    model = params_to_ref_nerf(params0, ref.nerf.NeRF, requires_grad=True)
    topt = torch.optim.Adam(model.parameters(), lr=LR, eps=1e-8)
    # one real step so the torch optimizer state materializes
    out = model(torch.randn(4, 63 + 27))
    out.sum().backward()
    topt.step()
    fabricated = _lightning_ckpt(model, topt, epoch_next=2, global_step=1)
    # trainer configs default to coarse+fine; mirror coarse into fine
    fabricated["state_dict"].update({
        k.replace("nerf_coarse.", "nerf_fine."): v.clone()
        for k, v in fabricated["state_dict"].items()
    })
    st = fabricated["optimizer_states"][0]
    n = len(st["param_groups"][0]["params"])
    st["param_groups"][0]["params"] = list(range(2 * n))
    st["state"].update({
        i + n: {k: (v.clone() if hasattr(v, "clone") else v)
                for k, v in st["state"][i].items()}
        for i in range(n)
    })
    torch_path = str(tmp_path / "ref2.ckpt")
    torch.save(fabricated, torch_path)
    our_path = str(tmp_path / "migrated2.ckpt")
    import_full_checkpoint(torch_path, our_path)

    from nerf_pl_tpu.config import Config
    from nerf_pl_tpu.training.trainer import NeRFSystem

    cfg = Config(
        root_dir=str(blender_root), dataset_name="blender", img_wh=(16, 16),
        N_samples=8, N_importance=8, batch_size=32, num_epochs=4, chunk=256,
        blender_near=2.0, blender_far=6.0, white_back=True, exp_name="mig",
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"),
        ckpt_path=our_path, use_fused_mlp=False, compilation_cache=False,
    )
    system = NeRFSystem(cfg)
    assert system.epoch0 == 2  # resumes AFTER the last completed epoch (1)
    adam_state = jax.tree_util.tree_leaves(
        system.opt_state, is_leaf=lambda x: hasattr(x, "mu")
    )[0]
    assert int(np.asarray(adam_state.count)) == 1
    np.testing.assert_allclose(
        np.asarray(system.params["coarse"]["sigma"]["w"]),
        model.state_dict()["sigma.weight"].numpy().T,
        rtol=0, atol=1e-6,
    )


def test_full_state_cli_round_trip(ray_buffer, tmp_path):
    """The import_torch_ckpt CLI surface: --full_state in both directions
    (flag wiring, not just the library functions)."""
    from nerf_pl_tpu.tools.import_torch_ckpt import main as cli

    params0 = {"coarse": init_nerf(jax.random.PRNGKey(5), D=2, W=16)}
    opt = get_optimizer("adam", lambda step: LR)
    rays_all, rgbs_all = ray_buffer
    step = _jax_step_fn(opt)
    params, opt_state, _ = _jax_steps(
        step, params0, opt.init(params0), rays_all, rgbs_all, 0, 2
    )
    ours = str(tmp_path / "cli_ours.ckpt")
    checkpoints.save_checkpoint(
        ours, {"params": jax.device_get(params),
               "opt_state": jax.device_get(opt_state), "epoch": 1},
    )
    exported = str(tmp_path / "cli_ref.ckpt")
    cli(["--ckpt_path", ours, "--out_path", exported, "--export",
         "--full_state", "--lr", str(LR)])
    back = str(tmp_path / "cli_back.ckpt")
    cli(["--ckpt_path", exported, "--out_path", back, "--full_state"])
    state = checkpoints.load_checkpoint(back)
    assert int(np.asarray(state["epoch"])) == 1
    # moments survived the round trip
    raw = checkpoints.load_checkpoint(ours)
    a = np.asarray(state["opt_state"]["0"]["mu"]["coarse"]["sigma"]["w"])
    b = np.asarray(raw["opt_state"]["0"]["mu"]["coarse"]["sigma"]["w"])
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


def test_full_state_rejects_non_adam_and_bad_out_path(ref, tmp_path):
    """Optimizer-type validation (review round 3): radam/ranger/sgd states
    must NOT silently import as Adam; --full_state out paths must keep the
    .ckpt suffix the trainer's resume gate requires."""
    model = ref.nerf.NeRF(D=2, W=16, in_channels_xyz=63, in_channels_dir=27,
                          skips=[4])

    def trainer_ckpt(opt):
        model(torch.randn(2, 90)).sum().backward()
        opt.step()
        return {
            "epoch": 1, "global_step": 2,
            "state_dict": {f"nerf_coarse.{k}": v
                           for k, v in model.state_dict().items()},
            "optimizer_states": [opt.state_dict()],
            "lr_schedulers": [],
        }

    # the reference's RAdam ('buffer' group key) — Adam-named moments but a
    # different update rule; must raise, not silently import
    path = str(tmp_path / "radam.ckpt")
    torch.save(trainer_ckpt(ref.optimizers.RAdam(model.parameters(),
                                                 lr=1e-3)), path)
    with pytest.raises(ValueError, match="radam"):
        import_full_checkpoint(path, str(tmp_path / "o1.ckpt"))

    # the reference's Ranger ('alpha'/'k' group keys)
    path = str(tmp_path / "ranger.ckpt")
    torch.save(trainer_ckpt(ref.optimizers.Ranger(model.parameters(),
                                                  lr=1e-3)), path)
    with pytest.raises(ValueError, match="ranger"):
        import_full_checkpoint(path, str(tmp_path / "o2.ckpt"))

    # torch SGD (no exp_avg at all) — clear error, not a KeyError
    path = str(tmp_path / "sgd.ckpt")
    torch.save(trainer_ckpt(torch.optim.SGD(model.parameters(), lr=0.1,
                                            momentum=0.9)), path)
    with pytest.raises(ValueError, match="sgd"):
        import_full_checkpoint(path, str(tmp_path / "o3.ckpt"))

    # a VALID adam state written to a non-.ckpt path would silently resume
    # weights-only (trainer.py gates full restore on the suffix) — reject
    path = str(tmp_path / "adam.ckpt")
    torch.save(trainer_ckpt(torch.optim.Adam(model.parameters(), lr=1e-3)),
               path)
    with pytest.raises(ValueError, match=".ckpt"):
        import_full_checkpoint(path, str(tmp_path / "resume.msgpack"))
    # and the .ckpt path imports fine
    import_full_checkpoint(path, str(tmp_path / "resume.ckpt"))

    # weight_decay != 0 (advisor round 3): the resumed optax chain carries
    # no coupled L2 — a silent import would change the continued trajectory
    path = str(tmp_path / "wd.ckpt")
    torch.save(trainer_ckpt(torch.optim.Adam(model.parameters(), lr=1e-3,
                                             weight_decay=1e-4)), path)
    with pytest.raises(ValueError, match="weight_decay"):
        import_full_checkpoint(path, str(tmp_path / "o4.ckpt"))


def test_corrupt_ckpt_error_is_not_allow_pickle_advice(tmp_path):
    """A truncated/corrupt file must surface the loader's own error, NOT the
    'rerun with --allow_pickle' message that steers users toward unsafe
    unpickling of a damaged or untrusted file (advisor round 3)."""
    from nerf_pl_tpu.tools.import_torch_ckpt import import_torch_checkpoint

    path = str(tmp_path / "corrupt.ckpt")
    with open(path, "wb") as f:
        f.write(b"PK\x03\x04not really a zip archive")
    with pytest.raises(Exception) as ei:
        import_torch_checkpoint(path, str(tmp_path / "out.msgpack"))
    assert "allow_pickle" not in str(ei.value)
