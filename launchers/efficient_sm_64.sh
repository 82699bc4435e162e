#!/bin/bash
# Efficient shadow mapping at 64x64 (cf. reference 64x64Statue_150.sh family)
python train_efficient_sm.py \
  --dataset_name efficient_sm --root_dir "${DATA_DIR:?set DATA_DIR}" \
  --img_wh 64 64 --N_samples 64 --N_importance 64 --noise_std 0 \
  --batch_size 1024 --num_epochs 200 \
  --optimizer adam --lr 1e-5 \
  --grad_on_light --Light_N_importance 32 \
  --shadow_method shadow_method_2 \
  --exp_name eff_sm_64 "$@"
