"""Tools: eval CLI, mesh extraction, weights-only export."""
import glob
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_ckpt(blender_root, tmp_path_factory):
    """Train 1 epoch on the tiny scene and return the ckpt path."""
    from nerf_pl_tpu.config import Config
    from nerf_pl_tpu.training.trainer import NeRFSystem

    tmp = tmp_path_factory.mktemp("tool_run")
    cfg = Config(
        root_dir=blender_root, dataset_name="blender", img_wh=(16, 16),
        N_samples=8, N_importance=8, batch_size=16, num_epochs=1, chunk=256,
        lr=5e-3, exp_name="tools", log_dir=str(tmp / "logs"),
        ckpt_dir=str(tmp / "ckpts"), num_sanity_val_steps=0,
    )
    NeRFSystem(cfg).fit()
    ckpts = sorted(glob.glob(str(tmp / "ckpts" / "tools" / "*.ckpt")))
    assert ckpts
    return ckpts[-1]


def test_eval_tool(blender_root, trained_ckpt, tmp_path):
    from nerf_pl_tpu.tools.evaluate import get_opts, run

    out = str(tmp_path / "results")
    args = get_opts(
        [
            "--root_dir", blender_root, "--dataset_name", "blender",
            "--split", "test", "--img_wh", "16", "16",
            "--N_samples", "8", "--N_importance", "8",
            "--chunk", "256", "--ckpt_path", trained_ckpt,
            "--scene_name", "tiny", "--out_dir", out, "--save_depth",
        ]
    )
    mean_psnr = run(args)
    assert mean_psnr is not None and np.isfinite(mean_psnr)
    d = os.path.join(out, "blender", "tiny")
    assert os.path.exists(os.path.join(d, "000.png"))
    assert os.path.exists(os.path.join(d, "tiny.gif"))
    assert os.path.exists(os.path.join(d, "depth_000.pfm"))
    # the PFM roundtrips
    from nerf_pl_tpu.data.depth_utils import read_pfm

    depth, _ = read_pfm(os.path.join(d, "depth_000.pfm"))
    assert depth.shape == (16, 16)


@pytest.fixture(scope="module")
def mesh_ckpt(tmp_path_factory):
    """A checkpoint whose fine model has guaranteed density variation: a
    fresh init with the sigma bias lifted so ~half the grid is 'inside'
    (a 1-epoch toy model can legitimately end up with zero density)."""
    import jax

    from nerf_pl_tpu.models.nerf import init_nerf
    from nerf_pl_tpu.training.checkpoints import save_checkpoint

    params = {
        "coarse": init_nerf(jax.random.PRNGKey(0)),
        "fine": init_nerf(jax.random.PRNGKey(1)),
    }
    for name in params:
        params[name]["sigma"]["b"] = params[name]["sigma"]["b"] + 0.05
    path = str(tmp_path_factory.mktemp("mesh_ckpt") / "mesh.ckpt")
    save_checkpoint(path, {"params": params})
    return path


def _surface_threshold(ckpt, n_grid=24):
    """Half the max density: guarantees voxels on both sides of a surface."""
    import numpy as np

    from nerf_pl_tpu.tools.evaluate import load_models
    from nerf_pl_tpu.tools.extract_mesh import query_sigma_grid

    params = load_models(ckpt)
    g = np.linspace(-1, 1, n_grid).astype(np.float32)
    xyz = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)
    sigma = np.maximum(query_sigma_grid(params["fine"], xyz, 512), 0)
    assert sigma.max() > 0, "model has no positive density anywhere"
    return 0.5 * float(sigma.max())


def test_extract_mesh_tool(blender_root, mesh_ckpt, tmp_path):
    from nerf_pl_tpu.tools.extract_mesh import get_opts, run
    from nerf_pl_tpu.tools.mesh_utils import read_ply

    thr = _surface_threshold(mesh_ckpt)
    out = str(tmp_path / "mesh.ply")
    args = get_opts(
        [
            "--root_dir", blender_root, "--dataset_name", "blender",
            "--img_wh", "16", "16", "--N_samples", "8", "--chunk", "512",
            "--ckpt_path", mesh_ckpt, "--N_grid", "32",
            "--sigma_threshold", str(thr), "--out_path", out,
        ]
    )
    path = run(args)
    verts, tris, colors = read_ply(path)
    assert len(verts) > 0 and len(tris) > 0
    assert colors is not None and colors.shape == (len(verts), 3)
    # vertices inside the queried range
    assert (np.abs(verts) <= 1.0 + 1e-5).all()


def test_extract_mesh_vertex_normal_path(blender_root, mesh_ckpt, tmp_path):
    from nerf_pl_tpu.tools.extract_mesh import get_opts, run
    from nerf_pl_tpu.tools.mesh_utils import read_ply

    thr = _surface_threshold(mesh_ckpt)
    out = str(tmp_path / "meshn.ply")
    args = get_opts(
        [
            "--root_dir", blender_root, "--dataset_name", "blender",
            "--img_wh", "16", "16", "--N_samples", "8", "--chunk", "512",
            "--ckpt_path", mesh_ckpt, "--N_grid", "24",
            "--sigma_threshold", str(thr), "--out_path", out,
            "--use_vertex_normal", "--N_importance", "8",
        ]
    )
    path = run(args)
    verts, tris, colors = read_ply(path)
    assert len(verts) > 0 and colors is not None


def test_save_weights_only(trained_ckpt, tmp_path):
    from nerf_pl_tpu.training.checkpoints import load_checkpoint

    out = str(tmp_path / "weights.ckpt")
    r = subprocess.run(
        [sys.executable, "save_weights_only.py", "--ckpt_path", trained_ckpt,
         "--out_path", out],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
    )
    assert r.returncode == 0, r.stderr
    state = load_checkpoint(out)
    assert "params" in state and "opt_state" not in state
    # "portable scene": coarse+fine weights ~5 MB
    assert os.path.getsize(out) < 8 * 1024 * 1024
    assert os.path.getsize(out) < os.path.getsize(trained_ckpt)


def test_extract_mesh_vol_export(blender_root, mesh_ckpt, tmp_path):
    from nerf_pl_tpu.tools.extract_mesh import get_opts, run
    from nerf_pl_tpu.tools.mesh_utils import read_vol

    vol = str(tmp_path / "scene.vol")
    args = get_opts(
        [
            "--root_dir", blender_root, "--dataset_name", "blender",
            "--img_wh", "16", "16", "--N_samples", "8", "--chunk", "512",
            "--ckpt_path", mesh_ckpt, "--N_grid", "16",
            "--vol_path", vol, "--vol_only",
        ]
    )
    assert run(args) == vol
    grid, (xr, yr, zr) = read_vol(vol)
    assert grid.shape == (16, 16, 16)
    assert grid.max() > 0  # trained model has density somewhere
    assert tuple(xr) == (-1.0, 1.0)


def test_save_weights_only_never_overwrites_input(trained_ckpt, tmp_path):
    """Regression: an input path without '.ckpt' made the derived output
    path equal the input, silently destroying the full checkpoint."""
    import shutil
    import subprocess
    import sys

    src = str(tmp_path / "last")  # no .ckpt extension
    shutil.copy(trained_ckpt, src)
    before = open(src, "rb").read()
    r = subprocess.run(
        [sys.executable, "save_weights_only.py", "--ckpt_path", src],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert open(src, "rb").read() == before, "input checkpoint was clobbered"
    assert os.path.exists(str(tmp_path / "last_weights.ckpt"))


def test_eval_tool_coarse_only_checkpoint(blender_root, tmp_path):
    """A checkpoint trained with N_importance=0 must render coarse-only
    (previously a randomly initialized fine net silently produced garbage)."""
    import jax

    from nerf_pl_tpu.models.nerf import init_nerf
    from nerf_pl_tpu.tools.evaluate import get_opts, load_models, run
    from nerf_pl_tpu.training.checkpoints import save_checkpoint

    ckpt = str(tmp_path / "coarse_only.ckpt")
    save_checkpoint(ckpt, {"params": {"coarse": init_nerf(jax.random.PRNGKey(0))}})
    assert "fine" not in load_models(ckpt)
    args = get_opts(
        ["--root_dir", blender_root, "--dataset_name", "blender",
         "--split", "val", "--img_wh", "16", "16", "--N_samples", "8",
         "--N_importance", "8", "--chunk", "256", "--ckpt_path", ckpt,
         "--out_dir", str(tmp_path / "out"), "--scene_name", "co"]
    )
    mean_psnr = run(args)
    assert mean_psnr is not None and np.isfinite(mean_psnr)


def test_extract_mesh_fusion_window(mesh_ckpt, tmp_path):
    """Color fusion with >8 views exercises the in-flight dispatch window
    (views drained mid-loop, not only in the final flush); the drain order
    is FIFO either way, so results must be deterministic across runs."""
    from nerf_pl_tpu.data.synthetic import generate_scene
    from nerf_pl_tpu.tools.extract_mesh import get_opts, run
    from nerf_pl_tpu.tools.mesh_utils import read_ply

    root = generate_scene(
        str(tmp_path / "scene10"), img_wh=16, n_train=10, n_val=1, n_test=1
    )
    thr = _surface_threshold(mesh_ckpt)
    argv = [
        "--root_dir", root, "--dataset_name", "blender",
        "--img_wh", "16", "16", "--N_samples", "8", "--chunk", "512",
        "--ckpt_path", mesh_ckpt, "--N_grid", "24",
        "--sigma_threshold", str(thr),
        "--blender_near", "1", "--blender_far", "12",
    ]
    out1 = str(tmp_path / "m1.ply")
    out2 = str(tmp_path / "m2.ply")
    run(get_opts(argv + ["--out_path", out1]))
    run(get_opts(argv + ["--out_path", out2]))
    v1, t1, c1 = read_ply(out1)
    v2, t2, c2 = read_ply(out2)
    assert len(v1) > 0 and c1 is not None
    assert np.array_equal(v1, v2) and np.array_equal(c1, c2)


def test_import_torch_ckpt(tmp_path):
    """Drive the ACTUAL reference NeRF module: save a Lightning-style
    checkpoint of two reference models, import it, and assert forward
    parity between the torch modules and ``nerf_apply`` on the imported
    pytree (plus artifact compatibility with our prefix-filtered loader)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from reference_harness import load_reference

    from nerf_pl_tpu.models.nerf import init_nerf, nerf_apply
    from nerf_pl_tpu.tools.import_torch_ckpt import import_torch_checkpoint
    from nerf_pl_tpu.training.checkpoints import (
        load_checkpoint,
        load_ckpt_into,
    )

    ref = load_reference()
    torch.manual_seed(0)
    kw = dict(D=4, W=32, in_channels_xyz=63, in_channels_dir=27, skips=[2])
    coarse = ref.nerf.NeRF(**kw)
    fine = ref.nerf.NeRF(**kw)
    sd = {f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()}
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    in_path = str(tmp_path / "ref_lightning.ckpt")
    torch.save({"state_dict": sd, "epoch": 7, "global_step": 123}, in_path)

    out_path = str(tmp_path / "imported.ckpt")
    params = import_torch_checkpoint(in_path, out_path)
    assert set(params) == {"coarse", "fine"}

    x = np.random.RandomState(1).randn(17, 90).astype(np.float32)
    for name, model in (("coarse", coarse), ("fine", fine)):
        with torch.no_grad():
            want = model(torch.from_numpy(x)).numpy()
        got = np.asarray(nerf_apply(
            jax.tree.map(jnp.asarray, params[name]), jnp.asarray(x)
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # sigma_only fast path too (reference models/nerf.py:102-114)
        with torch.no_grad():
            want_s = model(torch.from_numpy(x[:, :63]), sigma_only=True).numpy()
        got_s = np.asarray(nerf_apply(
            jax.tree.map(jnp.asarray, params[name]), jnp.asarray(x[:, :63]),
            sigma_only=True,
        ))
        np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-5)

    # the artifact is a standard weights-only checkpoint: restorable with
    # the prefix-filtered partial loader into a live pytree
    state = load_checkpoint(out_path)
    assert set(state) == {"params"}
    live = init_nerf(jax.random.PRNGKey(3), D=4, W=32, skips=(2,))
    merged = load_ckpt_into(live, out_path, model_name="coarse")
    np.testing.assert_allclose(
        np.asarray(merged["sigma"]["w"]),
        np.asarray(params["coarse"]["sigma"]["w"]),
    )

    # the reference's bare save_weights_only format (state_dict only,
    # utils/save_weights_only.py:15) imports as well
    bare_path = str(tmp_path / "bare.ckpt")
    torch.save(sd, bare_path)
    params2 = import_torch_checkpoint(bare_path, str(tmp_path / "b_out.ckpt"))
    np.testing.assert_allclose(
        params2["fine"]["rgb"]["b"], params["fine"]["rgb"]["b"]
    )


def test_export_torch_ckpt_loads_in_reference(tmp_path):
    """Reverse migration: one of OUR checkpoints exports to a torch file the
    reference's own ``load_ckpt`` (``utils/__init__.py:72-76``) restores,
    and the restored torch model matches ``nerf_apply`` bit-for-tolerance."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from reference_harness import load_reference

    from nerf_pl_tpu.models.nerf import init_nerf, nerf_apply
    from nerf_pl_tpu.tools.import_torch_ckpt import export_torch_checkpoint
    from nerf_pl_tpu.training.checkpoints import save_checkpoint

    ref = load_reference()
    key = jax.random.PRNGKey(11)
    kc, kf = jax.random.split(key)
    params = {
        "coarse": init_nerf(kc, D=4, W=32, skips=(2,)),
        "fine": init_nerf(kf, D=4, W=32, skips=(2,)),
    }
    ours = str(tmp_path / "ours.ckpt")
    save_checkpoint(ours, {"params": params, "epoch": 3})
    exported = str(tmp_path / "exported.ckpt")
    export_torch_checkpoint(ours, exported)

    x = np.random.RandomState(2).randn(13, 90).astype(np.float32)
    for name in ("coarse", "fine"):
        model = ref.nerf.NeRF(D=4, W=32, in_channels_xyz=63,
                              in_channels_dir=27, skips=[2])
        ref.utils.load_ckpt(model, exported, model_name=f"nerf_{name}")
        with torch.no_grad():
            want = model(torch.from_numpy(x)).numpy()
        got = np.asarray(nerf_apply(params[name], jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_import_bare_single_model_state_dict(tmp_path):
    """A bare NeRF state_dict with no nerf_coarse./nerf_fine. prefixes
    (a hand-re-saved single model) imports as coarse-only."""
    torch = pytest.importorskip("torch")
    from reference_harness import load_reference

    from nerf_pl_tpu.tools.import_torch_ckpt import import_torch_checkpoint

    ref = load_reference()
    torch.manual_seed(2)
    model = ref.nerf.NeRF(D=3, W=16, in_channels_xyz=63, in_channels_dir=27,
                          skips=[1])
    p = str(tmp_path / "bare_single.ckpt")
    torch.save(model.state_dict(), p)
    params = import_torch_checkpoint(p, str(tmp_path / "out.ckpt"))
    assert set(params) == {"coarse"}
    assert len(params["coarse"]["xyz_layers"]) == 3
