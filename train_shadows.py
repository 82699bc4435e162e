"""Train RGB NeRF on a shadow dataset (reference ``train_shadows.py`` CLI
parity)."""
import os

from nerf_pl_tpu.config import get_opts
from nerf_pl_tpu.training.shadow_systems import ShadowsSystem


def main():
    cfg = get_opts()
    system = ShadowsSystem(cfg)
    os.makedirs(os.path.join(cfg.log_dir, cfg.exp_name), exist_ok=True)
    cfg.save(os.path.join(cfg.log_dir, cfg.exp_name, "config.json"))
    system.fit()


if __name__ == "__main__":
    main()
