#!/bin/bash
# Host-streaming slab-length sweep (VERDICT r4 next #7).
#
# Round-4's streaming mode sustained 103.8k rays/s vs 108.7k device-
# resident with STREAM_SLAB_STEPS fixed at 16 and never swept.  This runs
# the round-4 long-run protocol (100-view 64^2 scene, batch 4096,
# N 64/128, bf16, cosine, val cadence 1) in streaming mode at slab
# lengths 8/16/32/64 and reports the finalize-to-finalize rate per slab.
#
#   scripts/stream_slab_sweep.sh /tmp/statue64 [epochs]
set -euo pipefail
SCENE="${1:?usage: stream_slab_sweep.sh <64px-blender-scene> [epochs]}"
EPOCHS="${2:-40}"
cd "$(dirname "$0")/.."

for SLAB in 8 16 32 64; do
  OUT=/tmp/slab_sweep_$SLAB
  rm -rf "$OUT"
  python train.py --root_dir "$SCENE" --dataset_name blender \
    --img_wh 64 64 --N_samples 64 --N_importance 128 --batch_size 4096 \
    --num_epochs "$EPOCHS" --lr 5e-4 --lr_scheduler cosine \
    --compute_dtype bfloat16 --blender_near 1 --blender_far 12 \
    --white_back true --noise_std 0 \
    --data_device_resident false --stream_slab_steps "$SLAB" \
    --num_sanity_val_steps 0 \
    --exp_name slab --log_dir "$OUT/logs" --ckpt_dir "$OUT/ckpts" \
    > "$OUT.log" 2>&1
  echo -n "slab=$SLAB  "
  python scripts/sustained_rate.py "$OUT/logs/slab/metrics.jsonl"
done
