"""Train the flagship efficient shadow-mapping system (reference
``train_efficient_sm.py`` CLI parity).

Example (reference launcher hparams, e.g. 64x64Statue_150.sh):
    python train_efficient_sm.py --dataset_name efficient_sm --root_dir <scene> \
        --N_importance 64 --N_samples 64 --img_wh 64 64 --noise_std 0 \
        --num_epochs 200 --batch_size 1024 --optimizer adam --lr 1e-5 \
        --exp_name statue --grad_on_light --Light_N_importance 32 \
        --shadow_method shadow_method_2
"""
from nerf_pl_tpu.training.launch import launch
from nerf_pl_tpu.training.shadow_systems import EfficientSMSystem


def main():
    launch(EfficientSMSystem, allowed_datasets=("efficient_sm", "pyredner2"))


if __name__ == "__main__":
    main()
