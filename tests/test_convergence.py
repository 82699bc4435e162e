"""Real-scene convergence: train on the analytic ray-traced sphere scene
(geometrically consistent multi-view data, unlike the random-noise
fixtures) and require genuine learning."""
import numpy as np
import pytest

from nerf_pl_tpu.config import Config
from nerf_pl_tpu.data.synthetic import generate_scene
from nerf_pl_tpu.training.trainer import NeRFSystem


@pytest.fixture(scope="module")
def sphere_root(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sphere") / "scene")
    generate_scene(out, img_wh=16, n_train=6, n_val=1, n_test=1)
    return out


def test_nerf_converges_on_consistent_scene(sphere_root, tmp_path):
    cfg = Config(
        root_dir=sphere_root, dataset_name="blender", img_wh=(16, 16),
        N_samples=16, N_importance=16, batch_size=64, num_epochs=8,
        chunk=512, lr=5e-3, noise_std=0.0, exp_name="conv",
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"),
        num_sanity_val_steps=0, blender_near=1.0, blender_far=12.0,
        white_back=True, val_every_n_epochs=8,
    )
    system = NeRFSystem(cfg)
    m0 = system.validation(0, max_images=1)
    system.fit()
    m1 = system.validation(9, max_images=1)
    # genuine learning on consistent geometry: val PSNR improves by >3 dB
    assert m1["val/psnr"] > m0["val/psnr"] + 3.0, (m0, m1)
    assert m1["val/psnr"] > 12.5, m1
