"""Dataset parity against the ACTUAL reference loaders.

Round-1 dataset tests asserted our loaders against the SURVEY-documented
behavior; here the reference's own ``datasets/*.py`` classes run on the same
synthetic scenes and the resulting ray/target buffers must match elementwise:

  * ``datasets/blender.py``      — train buffer + val items (fork 1/200
    near/far behind its interactive gate, white-blend RGBA, valid_mask);
  * ``datasets/llff.py``         — pose centering/scaling, NDC train buffer,
    closest-to-center val selection;
  * ``datasets/blender_efficient_sm.py`` — shadow targets, +0.5 pixel rows,
    per-frame PPC poses, light rig rays/pixels.

The reference loaders need stock-torch-only shims (``reference_harness``) and
their ``input()`` confirmation gate patched to 'y' (datasets/blender.py:43).
"""
import argparse
import builtins
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture()
def yes_gate(monkeypatch):
    monkeypatch.setattr(builtins, "input", lambda *a, **k: "y")


def _import_ref_dataset(name):
    import importlib

    return importlib.import_module(f"datasets.{name}")


def test_blender_dataset_matches_reference(ref, blender_root, yes_gate):
    mod = _import_ref_dataset("blender")
    ref_train = mod.BlenderDataset(str(blender_root), "train", img_wh=(16, 16))

    from nerf_pl_tpu.data.blender import BlenderDataset

    # the fork's gated bounds: near/far 1/200, white_back False — but note
    # its RGBA blend composites over WHITE regardless (datasets/blender.py:86)
    ours = BlenderDataset(str(blender_root), "train", img_wh=(16, 16),
                          near=1.0, far=200.0, white_back=False)
    np.testing.assert_allclose(
        ours.all_rays, ref_train.all_rays.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        ours.all_rgbs, ref_train.all_rgbs.numpy(), rtol=1e-5, atol=1e-6
    )

    ref_val = mod.BlenderDataset(str(blender_root), "val", img_wh=(16, 16))
    ours_val = BlenderDataset(str(blender_root), "val", img_wh=(16, 16),
                              near=1.0, far=200.0, white_back=False)
    want = ref_val[0]
    got = ours_val[0]
    np.testing.assert_allclose(got["rays"], want["rays"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["rgbs"], want["rgbs"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["valid_mask"],
                                  want["valid_mask"].numpy())


@pytest.fixture(scope="module")
def llff_scene_root(tmp_path_factory):
    from nerf_pl_tpu.data.synthetic import generate_llff_scene

    root = tmp_path_factory.mktemp("llff_ref")
    generate_llff_scene(str(root), (8, 6), n_views=6)
    return str(root)


def test_llff_dataset_matches_reference(ref, llff_scene_root):
    mod = _import_ref_dataset("llff")
    from nerf_pl_tpu.data.llff import LLFFDataset

    ref_train = mod.LLFFDataset(llff_scene_root, "train", img_wh=(8, 6))
    ours = LLFFDataset(llff_scene_root, "train", img_wh=(8, 6))
    np.testing.assert_allclose(
        ours.all_rays, ref_train.all_rays.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        ours.all_rgbs, ref_train.all_rgbs.numpy(), rtol=1e-5, atol=1e-6
    )

    ref_val = mod.LLFFDataset(llff_scene_root, "val", img_wh=(8, 6))
    ours_val = LLFFDataset(llff_scene_root, "val", img_wh=(8, 6))
    want = ref_val[0]
    got = ours_val[0]
    # same closest-to-center view chosen, same rays/targets
    assert os.path.basename(ref_val.image_path_val) == os.path.basename(
        ours_val.image_path_val
    )
    np.testing.assert_allclose(got["rays"], want["rays"].numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got["rgbs"], want["rgbs"].numpy(),
                               rtol=1e-5, atol=1e-6)


def test_efficient_sm_dataset_matches_reference(ref, shadow_root):
    mod = _import_ref_dataset("blender_efficient_sm")
    hp = argparse.Namespace(black_and_white_test=False, coords_trans=False,
                            white_pix=-1, blur=-1)
    ref_ds = mod.BlenderEfficientShadows(str(shadow_root), "train",
                                         img_wh=(8, 8), hparams=hp)

    from nerf_pl_tpu.data.blender_efficient_sm import BlenderEfficientShadows

    ours = BlenderEfficientShadows(str(shadow_root), "train", img_wh=(8, 8))
    np.testing.assert_allclose(ours.all_rays, ref_ds.all_rays.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.all_rgbs, ref_ds.all_rgbs.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.all_pixels, ref_ds.all_pixels.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(ours.light.rays, ref_ds.light_rays.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.light.pixels,
                               ref_ds.light_pixels.numpy(),
                               rtol=1e-6, atol=1e-6)
    # per-frame camera PPC (reference replicates one Camera per ray)
    h = w = 8
    n_frames = ref_ds.all_rays.shape[0] // (h * w)
    for f in range(n_frames):
        ref_ppc = ref_ds.all_ppc[f * h * w]
        np.testing.assert_allclose(
            ours.cam_ms[f], ref_ppc.camera.numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            ours.cam_eyes[f], ref_ppc.eye_pos.numpy(), rtol=1e-5, atol=1e-6
        )
    # light PPC
    np.testing.assert_allclose(
        ours.light.camera, ref_ds.light_ppc.camera.numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        ours.light.eye_pos, ref_ds.light_ppc.eye_pos.numpy(),
        rtol=1e-5, atol=1e-6,
    )
