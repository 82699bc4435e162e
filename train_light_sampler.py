"""Train the sampled-light shadow system (reference
``train_light_sampler.py`` CLI parity): per-batch light rays built from the
projected (ul, vl) pixels instead of a cached full light render."""
from nerf_pl_tpu.training.launch import launch
from nerf_pl_tpu.training.shadow_systems import LightSamplerSystem


def main():
    launch(LightSamplerSystem)


if __name__ == "__main__":
    main()
