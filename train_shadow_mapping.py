"""Train the image-space shadow-mapping system (reference
``train_shadow_mapping.py`` CLI parity): whole-image camera+light depth
renders composited per image."""
from nerf_pl_tpu.training.launch import launch
from nerf_pl_tpu.training.shadow_systems import ShadowMappingSystem


def main():
    launch(ShadowMappingSystem)


if __name__ == "__main__":
    main()
