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


def test_shadows_dataset_matches_reference(ref, shadow_root):
    mod = _import_ref_dataset("blender_shadows")
    hp = argparse.Namespace(black_and_white_test=False)
    ref_ds = mod.BlenderDatasetShadows(str(shadow_root), "train",
                                       img_wh=(8, 8), hparams=hp)

    from nerf_pl_tpu.data.blender_shadows import BlenderDatasetShadows

    ours = BlenderDatasetShadows(str(shadow_root), "train", img_wh=(8, 8))
    assert len(ours) == len(ref_ds)
    want = ref_ds[0]
    got = ours[0]
    np.testing.assert_allclose(got["rays"], want["rays"].numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["rgbs"], want["rgbs"].numpy(),
                               rtol=1e-5, atol=1e-6)
    # light near/far 100/500 quirk (blender_shadows.py:49-50)
    np.testing.assert_allclose(got["light_rays"],
                               want["light_rays"].numpy(),
                               rtol=1e-5, atol=1e-6)
    for side in ("ppc", "light_ppc"):
        np.testing.assert_allclose(
            got[side]["camera"], want[side]["camera"].numpy(),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            got[side]["eye_pos"], want[side]["eye_pos"].numpy(),
            rtol=1e-5, atol=1e-6,
        )


def test_rgb_sm_dataset_matches_reference(ref, shadow_root):
    mod = _import_ref_dataset("blender_rgb_shadows")
    # max_images=-1 disables the unseeded np.random.shuffle subset
    # (blender_rgb_shadows.py:92-94)
    hp = argparse.Namespace(black_and_white_test=False, coords_trans=False,
                            max_images=-1, blur=-1)
    ref_ds = mod.BlenderRGBEfficientShadows(str(shadow_root), "train",
                                            img_wh=(8, 8), hparams=hp)

    from nerf_pl_tpu.data.blender_rgb_shadows import BlenderRGBEfficientShadows

    ours = BlenderRGBEfficientShadows(str(shadow_root), "train",
                                      img_wh=(8, 8), max_images=-1)
    np.testing.assert_allclose(ours.all_rays, ref_ds.all_rays.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.all_rgbs, ref_ds.all_rgbs.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.all_sm, ref_ds.all_sm_rgbs.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours.all_pixels, ref_ds.all_pixels.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_pyredner2_dataset_matches_reference(ref, tmp_path_factory,
                                             monkeypatch):
    from nerf_pl_tpu.data.synthetic import generate_pyredner_scene

    root = str(tmp_path_factory.mktemp("pyr_ref"))
    generate_pyredner_scene(root, img_wh=8, n_train=3, n_val=1, n_test=1)

    mod = _import_ref_dataset("pyredner2")
    hp = argparse.Namespace(black_and_white_test=False, coords_trans=False,
                            coords_trans2=False, blur=-1)
    # the reference opens frame['sm_file_path'] RAW (pyredner2.py:116-120,
    # no root_dir join) — its JSONs carried cwd-relative paths
    monkeypatch.chdir(root)
    ref_ds = mod.PyRednerShadowsDataset(root, "train", img_wh=(8, 8),
                                        hparams=hp)

    from nerf_pl_tpu.data.pyredner2 import PyRednerShadowsDataset

    ours = PyRednerShadowsDataset(root, "train", img_wh=(8, 8))
    np.testing.assert_allclose(ours.all_rays, ref_ds.all_rays.numpy(),
                               rtol=1e-4, atol=1e-5)
    # blur=-1 is TRUTHY in the reference (pyredner2.py:121-122: fixed
    # radius-5 blur whenever the flag is nonzero) — our loader reproduces
    np.testing.assert_allclose(ours.all_rgbs, ref_ds.all_rgbs.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours.all_pixels, ref_ds.all_pixels.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(ours.light.rays, ref_ds.light_rays.numpy(),
                               rtol=1e-4, atol=1e-5)
    ref_ppc = ref_ds.all_ppc[0]
    np.testing.assert_allclose(ours.cam_ms[0], ref_ppc.camera.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours.cam_eyes[0], ref_ppc.eye_pos.numpy(),
                               rtol=1e-5, atol=1e-6)
