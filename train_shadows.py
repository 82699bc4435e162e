"""Train RGB NeRF on a shadow dataset (reference ``train_shadows.py`` CLI
parity)."""
from nerf_pl_tpu.training.launch import launch
from nerf_pl_tpu.training.shadow_systems import ShadowsSystem


def main():
    launch(ShadowsSystem)


if __name__ == "__main__":
    main()
