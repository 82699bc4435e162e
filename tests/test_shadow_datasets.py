import numpy as np
import pytest

from nerf_pl_tpu.data import dataset_dict


def test_efficient_sm_train_buffers(shadow_root):
    ds = dataset_dict["efficient_sm"](shadow_root, "train", img_wh=(8, 8))
    n = 3 * 64
    assert ds.all_rays.shape == (n, 8)
    assert ds.all_pixels.shape == (n, 3)
    assert ds.all_rgbs.shape == (n, 3)
    assert ds.pose_idx.shape == (n,)
    assert ds.cam_ms.shape == (3, 3, 3) and ds.cam_eyes.shape == (3, 3)
    # pixel convention: [x+0.5, y+0.5, 1] row-major
    np.testing.assert_allclose(ds.all_pixels[0], [0.5, 0.5, 1.0])
    np.testing.assert_allclose(ds.all_pixels[1], [1.5, 0.5, 1.0])
    np.testing.assert_allclose(ds.all_pixels[8], [0.5, 1.5, 1.0])
    # near/far defaults 1/200 (blender_efficient_sm.py:72-77)
    np.testing.assert_allclose(ds.all_rays[0, 6:], [1.0, 200.0])
    assert ds.light.rays.shape == (64, 8)
    assert ds.white_back is True


def test_efficient_sm_white_pix_filter(shadow_root):
    full = dataset_dict["efficient_sm"](shadow_root, "train", img_wh=(8, 8))
    filt = dataset_dict["efficient_sm"](
        shadow_root, "train", img_wh=(8, 8), white_pix=0.5
    )
    assert len(filt.all_rays) < len(full.all_rays)
    assert (filt.all_rgbs.sum(1) / 3.0 > 0.5).all()


def test_efficient_sm_val_items(shadow_root):
    ds = dataset_dict["efficient_sm"](shadow_root, "val", img_wh=(8, 8))
    s = ds[0]
    assert s["rays"].shape == (64, 8)
    assert s["light_rays"].shape == (64, 8)
    assert s["ppc"]["camera"].shape == (3, 3)
    assert s["light_ppc"]["eye_pos"].shape == (3,)


def test_rgb_sm_dataset(shadow_root):
    ds = dataset_dict["rgb_sm"](shadow_root, "train", img_wh=(8, 8))
    assert ds.all_rgbs.shape == ds.all_sm.shape
    assert ds.white_back is True
    s = ds[5]
    assert set(s) >= {"rays", "pixels", "rgbs", "sm", "ppc"}


def test_shadows_dataset_per_image(shadow_root):
    ds = dataset_dict["shadows"](shadow_root, "train", img_wh=(8, 8))
    s = ds[0]
    assert s["rays"].shape == (64, 8)
    assert s["rgbs"].shape == (64, 3)
    # light near/far 100/500 (blender_shadows.py:49-50)
    np.testing.assert_allclose(s["light_rays"][0, 6:], [100.0, 500.0])
    assert ds.white_back is False


def test_pyredner2_dataset(tmp_path):
    import json

    from nerf_pl_tpu.models.camera import intrinsic_matrix
    from PIL import Image

    root = tmp_path / "pyr"
    root.mkdir()
    rng = np.random.RandomState(0)
    M = intrinsic_matrix(45.0, (8, 8)).tolist()
    frames = []
    for i in range(2):
        name = f"sm_{i}.png"
        Image.fromarray(
            (rng.rand(8, 8, 3) * 255).astype(np.uint8), "RGB"
        ).save(root / name)
        frames.append(
            {
                "transform_matrix": {
                    "eye_pos": [4.0, float(i), 4.0],
                    "camera": M,
                },
                "sm_file_path": name,
            }
        )
    meta = {
        "camera_angle_x": 0.6911,
        "light_camera_angle_x": 0.6911,
        "light_camera_transform_matrix": {
            "eye_pos": [0.0, 5.0, 5.0],
            "camera": M,
        },
        "look_at": [0.0, 0.0, 0.0],
        "frames": frames,
    }
    for split in ("train", "val"):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    ds = dataset_dict["pyredner2"](str(root), "train", img_wh=(8, 8))
    assert ds.all_rays.shape == (128, 8)
    assert ds.cam_ms.shape == (2, 3, 3)
    # PPC matrix comes verbatim from the JSON, not from lookat
    np.testing.assert_allclose(ds.cam_ms[0], np.asarray(M), rtol=1e-6)


def test_depth_utils_pfm_roundtrip(tmp_path):
    from nerf_pl_tpu.data.depth_utils import read_pfm, save_pfm

    img = np.random.RandomState(0).rand(6, 5).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    save_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_blender_black_and_white_is_raw_grayscale(shadow_root):
    """Reference bw branch (datasets/blender.py:68-72) is convert('L') with
    NO alpha blend — background must stay raw gray, not white-blended."""
    from nerf_pl_tpu.data.blender import BlenderDataset

    ds = BlenderDataset(shadow_root, split="train", img_wh=(8, 8),
                        black_and_white=True)
    rgbs = ds.all_rgbs
    assert rgbs.shape[1] == 3
    # replicated channels
    np.testing.assert_array_equal(rgbs[:, 0], rgbs[:, 1])
    np.testing.assert_array_equal(rgbs[:, 1], rgbs[:, 2])


def test_frame_shard_loaders(shadow_root):
    """--per_host_data loader contract (both shadow loaders): full pose
    tables on EVERY shard (the trainers replicate them), image rows
    partitioned exactly kept-frames[offset::step] with GLOBAL pose_idx."""
    from nerf_pl_tpu.data.blender_efficient_sm import BlenderEfficientShadows
    from nerf_pl_tpu.data.blender_rgb_shadows import BlenderRGBEfficientShadows

    for cls, kw in (
        (BlenderEfficientShadows, {}),
        (BlenderRGBEfficientShadows, {"max_images": -1}),
    ):
        full = cls(shadow_root, "train", img_wh=(8, 8), **kw)
        shards = [
            cls(shadow_root, "train", img_wh=(8, 8), frame_shard=(p, 2), **kw)
            for p in (0, 1)
        ]
        n_frames = full.cam_ms.shape[0]
        for sh in shards:
            # pose tables identical to the full load on every shard
            np.testing.assert_array_equal(sh.cam_ms, full.cam_ms)
            np.testing.assert_array_equal(sh.cam_eyes, full.cam_eyes)
        # shard p holds frames[p::2] wrap-padded to ceil(n/2) frames
        # (DistributedSampler-style — equal rows per host, global pose_idx)
        hw = 64
        target = -(-n_frames // 2)
        for p, sh in enumerate(shards):
            frames = list(range(p, n_frames, 2))
            frames = frames + frames[: target - len(frames)]
            assert sh.all_rays.shape[0] == target * hw
            np.testing.assert_array_equal(
                np.unique(sh.pose_idx),
                np.unique(np.asarray(frames, np.int32)),
            )
            np.testing.assert_array_equal(
                sh.all_rays,
                np.concatenate([full.all_rays[f * hw:(f + 1) * hw]
                                for f in frames]),
            )
            np.testing.assert_array_equal(
                sh.all_rgbs,
                np.concatenate([full.all_rgbs[f * hw:(f + 1) * hw]
                                for f in frames]),
            )
            if hasattr(full, "all_sm"):
                np.testing.assert_array_equal(
                    sh.all_sm,
                    np.concatenate([full.all_sm[f * hw:(f + 1) * hw]
                                    for f in frames]),
                )
        # the union of the shards' ACTUAL pose indices covers the dataset
        assert set(np.concatenate([s.pose_idx for s in shards]).tolist()) \
            == set(range(n_frames))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="frame_shard"):
        BlenderEfficientShadows(
            shadow_root, "train", img_wh=(8, 8), frame_shard=(5, 99)
        )


def test_equalize_rows_wraps_to_target():
    """Row equalization for content-dependent per-host filters: wrap-repeat
    to the global max, no-op when already at/above target."""
    from nerf_pl_tpu.data.sharding import equalize_rows

    a = np.arange(10).reshape(5, 2)
    b = np.arange(5)
    ea, eb = equalize_rows([a, b], 5, 8)
    assert ea.shape == (8, 2) and eb.shape == (8,)
    np.testing.assert_array_equal(ea[5:], a[:3])
    np.testing.assert_array_equal(eb[5:], b[:3])
    # wrap more than once
    (ec,) = equalize_rows([b], 5, 13)
    np.testing.assert_array_equal(ec, np.arange(13) % 5)
    # no-op at target
    (ed,) = equalize_rows([b], 5, 5)
    np.testing.assert_array_equal(ed, b)
