"""Train the image-space shadow-mapping system (reference
``train_shadow_mapping.py`` CLI parity): whole-image camera+light depth
renders composited per image."""
import os

from nerf_pl_tpu.config import get_opts
from nerf_pl_tpu.training.shadow_systems import ShadowMappingSystem


def main():
    cfg = get_opts()
    system = ShadowMappingSystem(cfg)
    os.makedirs(os.path.join(cfg.log_dir, cfg.exp_name), exist_ok=True)
    cfg.save(os.path.join(cfg.log_dir, cfg.exp_name, "config.json"))
    system.fit()


if __name__ == "__main__":
    main()
