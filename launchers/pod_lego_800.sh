#!/bin/bash
# BASELINE config 5: multi-host 800x800 Blender run, rays sharded across a
# v5e pod slice, followed by colored-mesh extraction.
#
# Run this same script once per host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`); each
# process discovers its coordinator from the TPU runtime and --multihost
# calls jax.distributed.initialize() so the 1-D Mesh('rays') spans every
# chip. The global ray buffer is sharded per host by the data layer
# (parallel/mesh.py shard_rays; DistributedSampler parity), parameters are
# replicated, and gradients psum over ICI inside the epoch program.
set -e
DATA="${DATA_DIR:-/data/nerf_synthetic/lego}"

python train.py \
  --dataset_name blender --root_dir "$DATA" \
  --img_wh 800 800 --N_samples 64 --N_importance 128 \
  --batch_size 4096 --num_epochs 16 \
  --optimizer adam --lr 5e-4 --lr_scheduler steplr \
  --decay_step 2 4 8 --decay_gamma 0.5 \
  --compute_dtype bfloat16 --multihost --per_host_data \
  --exp_name pod_lego_800 "$@"

# offline colored mesh from the trained scene (host 0 only; the sigma-grid
# query runs on the local chip, triangulation/color fusion on CPU)
if python -c "import jax; exit(jax.process_index())"; then
  python extract_color_mesh.py \
    --root_dir "$DATA" --dataset_name blender --scene_name pod_lego_800 \
    --img_wh 800 800 --N_grid 256 --sigma_threshold 20 \
    --x_range -1.2 1.2 --y_range -1.2 1.2 --z_range -1.2 1.2 \
    --ckpt_path "ckpts/pod_lego_800/epoch=15.ckpt"
fi
