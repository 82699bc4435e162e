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
        N_samples=16, N_importance=16, batch_size=64, num_epochs=12,
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
    assert m1["val/psnr"] > 12.5, m1  # disc-ground scene, 12 epochs


def test_shadow_learning_on_consistent_scene(sphere_root, tmp_path):
    """The flagship joint RGB+SM trainer must genuinely LEARN shadows on
    the analytic scene (the generator keeps all geometry inside the light
    frustum precisely so this is well-posed; reference-style recipe:
    grad_on_light + per-step light refresh)."""
    import json

    from nerf_pl_tpu.training.shadow_systems import RGBSMSystem

    cfg = Config(
        root_dir=sphere_root, dataset_name="rgb_sm", img_wh=(16, 16),
        N_samples=16, N_importance=16, batch_size=128, num_epochs=25,
        chunk=512, lr=2e-3, noise_std=0.0, exp_name="smconv",
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"),
        num_sanity_val_steps=0, val_every_n_epochs=25,
        Light_N_importance=16, sample_light_depth_every=1,
        grad_on_light=True, shadow_method="shadow_method_1",
        rgb_weight=1.0, sm_weight=0.3,
    )
    system = RGBSMSystem(cfg)
    system.fit()
    recs = [json.loads(l) for l in open(f"{system.logger.dir}/metrics.jsonl")]
    sm = [r["train/sm_psnr"] for r in recs if "train/sm_psnr" in r]
    assert len(sm) == 25
    first = np.mean(sm[:3])
    last = np.mean(sm[-3:])
    assert last > first + 2.0, (first, last)  # shadows genuinely improving
