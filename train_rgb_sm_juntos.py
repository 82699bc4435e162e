"""Train the joint RGB + shadow-map system (reference
``train_rgb_sm_juntos.py`` CLI parity): loss = rgb_weight*MSE(rgb) +
sm_weight*MSE(sm)."""
from nerf_pl_tpu.training.launch import launch
from nerf_pl_tpu.training.shadow_systems import RGBSMSystem


def main():
    launch(RGBSMSystem)


if __name__ == "__main__":
    main()
