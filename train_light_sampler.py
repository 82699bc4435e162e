"""Train the sampled-light shadow system (reference
``train_light_sampler.py`` CLI parity): per-batch light rays built from the
projected (ul, vl) pixels instead of a cached full light render."""
import os

from nerf_pl_tpu.config import get_opts
from nerf_pl_tpu.training.shadow_systems import LightSamplerSystem


def main():
    cfg = get_opts()
    system = LightSamplerSystem(cfg)
    os.makedirs(os.path.join(cfg.log_dir, cfg.exp_name), exist_ok=True)
    cfg.save(os.path.join(cfg.log_dir, cfg.exp_name, "config.json"))
    system.fit()


if __name__ == "__main__":
    main()
