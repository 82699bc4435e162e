#!/bin/bash
# Real-data acceptance gate (VERDICT r4 missing #4 / next #5).
#
# No real nerf_synthetic/LLFF data exists in the build environment (only
# analytic scenes), so the reference's published-number comparison cannot
# run here — this script is the READY-TO-FIRE path for the day a real
# dataset directory is mountable.  Point it at nerf_synthetic/lego and it
# runs the reference's OWN published recipe (16 epochs, batch 1024,
# lr 5e-4, steplr 2/4/8 gamma 0.5 — /root/reference/README.md:75-83) on
# our trainer, evals the 400^2 test split exactly like the reference's
# eval.py, and gates on the published PSNR 31.39 (README.md:161).
#
# Usage:
#   scripts/acceptance_real_data.sh /path/to/nerf_synthetic/lego [out_dir]
#   MIN_PSNR=31.4 scripts/acceptance_real_data.sh ...   # override the gate
#   FERN_DIR=/path/to/nerf_llff_data/fern scripts/acceptance_real_data.sh ...
#       additionally trains + evals the LLFF fern recipe (README.md LLFF
#       section: N_importance 64, img_wh 504x378, 30 epochs) — reported,
#       not gated (the reference publishes no fern PSNR number).
set -euo pipefail

LEGO_DIR="${1:?usage: acceptance_real_data.sh /path/to/nerf_synthetic/lego [out_dir]}"
OUT="${2:-/tmp/acceptance_lego}"
MIN_PSNR="${MIN_PSNR:-31.4}"
cd "$(dirname "$0")/.."

# SMOKE=1: plumbing self-test on a tiny analytic scene (16^2, 2 epochs,
# gate disabled) — validates the exact command chain without real data.
WH=400; EPOCHS=16; NS=64; NI=64; BATCH=1024; EXTRA=()
if [ -n "${SMOKE:-}" ]; then
  WH=16; EPOCHS=2; NS=8; NI=8; BATCH=64; MIN_PSNR=0
  EXTRA=(--blender_near 1 --blender_far 12)
fi
LAST=$((EPOCHS - 1))

test -f "$LEGO_DIR/transforms_train.json" || {
  echo "FAIL: $LEGO_DIR does not look like a blender scene" >&2; exit 2; }

echo "== train: reference published recipe (README.md:75-83) =="
python train.py \
  --dataset_name blender \
  --root_dir "$LEGO_DIR" \
  --N_samples "$NS" --N_importance "$NI" --img_wh "$WH" "$WH" --noise_std 0 \
  --num_epochs "$EPOCHS" --batch_size "$BATCH" \
  --optimizer adam --lr 5e-4 \
  --lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 \
  --exp_name acceptance_lego "${EXTRA[@]}" \
  --log_dir "$OUT/logs" --ckpt_dir "$OUT/ckpts"

# top-5 val-loss pruning may have dropped the literal last epoch — eval
# the newest surviving checkpoint (the reference's eval.py is likewise
# pointed at whichever ckpt the ModelCheckpoint callback kept)
CKPT="$OUT/ckpts/acceptance_lego/epoch=$LAST.ckpt"
if [ ! -f "$CKPT" ]; then
  CKPT=$(ls -v "$OUT"/ckpts/acceptance_lego/epoch=*.ckpt 2>/dev/null | tail -1)
fi
test -n "$CKPT" && test -f "$CKPT" || {
  echo "FAIL: no checkpoint found after training" >&2; exit 2; }
echo "evaluating $CKPT"

echo "== eval: ${WH}^2 test split (README.md:150-161) =="
python eval.py \
  --root_dir "$LEGO_DIR" \
  --dataset_name blender --scene_name acceptance_lego \
  --img_wh "$WH" "$WH" --N_samples "$NS" --N_importance "$NI" \
  --ckpt_path "$CKPT" "${EXTRA[@]}" \
  --out_dir "$OUT/results" | tee "$OUT/eval.log"

python - "$OUT/eval.log" "$MIN_PSNR" <<'PY'
import re, sys
log, min_psnr = open(sys.argv[1]).read(), float(sys.argv[2])
m = re.search(r"Mean PSNR : ([0-9.]+)", log)
assert m, "eval printed no Mean PSNR"
psnr = float(m.group(1))
ref = 31.39  # reference README.md:161 (paper: 32.54)
print(f"lego 400^2 test PSNR: {psnr:.2f}  "
      f"(reference published {ref}; delta {psnr - ref:+.2f} dB)")
if psnr < min_psnr:
    sys.exit(f"FAIL: PSNR {psnr:.2f} < gate {min_psnr}")
print("PASS")
PY

if [ -n "${FERN_DIR:-}" ]; then
  echo "== optional: LLFF fern recipe (README.md LLFF section) =="
  python train.py \
    --dataset_name llff --root_dir "$FERN_DIR" \
    --N_importance 64 --img_wh 504 378 \
    --num_epochs 30 --batch_size 1024 \
    --optimizer adam --lr 5e-4 --lr_scheduler steplr \
    --decay_step 10 20 --decay_gamma 0.5 \
    --exp_name acceptance_fern \
    --log_dir "$OUT/logs" --ckpt_dir "$OUT/ckpts"
  python eval.py \
    --root_dir "$FERN_DIR" --dataset_name llff --scene_name acceptance_fern \
    --img_wh 504 378 --N_importance 64 \
    --ckpt_path "$OUT/ckpts/acceptance_fern/epoch=29.ckpt" \
    --out_dir "$OUT/results_fern" | tee "$OUT/eval_fern.log"
  echo "(fern PSNR reported above — no published reference number to gate on)"
fi
