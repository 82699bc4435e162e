"""Train a vanilla NeRF (reference ``train.py`` CLI parity).

Example (Blender lego, reference recipe README.md:75-83):
    python train.py --dataset_name blender --root_dir /data/lego \
        --N_importance 64 --img_wh 400 400 --num_epochs 16 --batch_size 1024 \
        --optimizer adam --lr 5e-4 --lr_scheduler steplr \
        --decay_step 2 4 8 --decay_gamma 0.5 --exp_name exp
"""
from nerf_pl_tpu.training.launch import launch
from nerf_pl_tpu.training.trainer import NeRFSystem


def main():
    launch(NeRFSystem)


if __name__ == "__main__":
    main()
