"""Train the joint RGB + shadow-map system (reference
``train_rgb_sm_juntos.py`` CLI parity): loss = rgb_weight*MSE(rgb) +
sm_weight*MSE(sm)."""
import os

from nerf_pl_tpu.config import get_opts
from nerf_pl_tpu.training.shadow_systems import RGBSMSystem


def main():
    cfg = get_opts()
    system = RGBSMSystem(cfg)
    os.makedirs(os.path.join(cfg.log_dir, cfg.exp_name), exist_ok=True)
    cfg.save(os.path.join(cfg.log_dir, cfg.exp_name, "config.json"))
    system.fit()


if __name__ == "__main__":
    main()
