#!/bin/bash
# Real-TPU production training demo (VERDICT r4 item 2): cli.train at full
# width on the chip for thousands of steps, on the learnable stick-figure
# datasets, then held-out evaluation with the PCKh curve PNG.
#   bash scripts/chip_train_demo.sh [outdir]
set -x
cd "$(dirname "$0")/.."
OUT=${1:-runs_r5/chip_train}
mkdir -p "$OUT"

# 1) The reference's actual final model (train.py:545-601) at production
#    geometry: features 256, depth 4, 256^2, bf16, batch 8 — 1920 steps.
time python -m cli.train --experiment progressive_mpii_final \
  --dataset synthetic --synthetic-style stickfigure --n-synthetic 384 \
  --seed 11 --input-size 256 --batch-size 8 --epochs 40 \
  --save "$OUT/progressive_ckpt" --save-every 40 --async-save \
  --logdir "$OUT/tb" --run-name progressive_chip --log-every 100 \
  --image-every 400 --prefetch-threads 2 \
  2>&1 | tee "$OUT/progressive_train.log"

# Held-out stick-figures (different seed => unseen persons).
python -m cli.evaluate --experiment progressive_mpii_final \
  --dataset synthetic --synthetic-style stickfigure --n-synthetic 96 \
  --seed 99 --input-size 256 --batch-size 8 \
  --load "$OUT/progressive_ckpt" --plot "$OUT/progressive_pckh.png" \
  2>&1 | tee "$OUT/progressive_eval.log"

# 2) The flagship (BASELINE headline config) in its production training
#    configuration: scan over the 8 weight-shared stacks + dots remat.
time python -m cli.train --experiment hourglass8_skeleton \
  --scan-stacks --remat --remat-policy dots \
  --dataset synthetic --synthetic-style stickfigure --n-synthetic 384 \
  --seed 12 --input-size 256 --batch-size 8 --epochs 25 \
  --save "$OUT/flagship_ckpt" --save-every 25 --async-save \
  --logdir "$OUT/tb" --run-name flagship_chip --log-every 100 \
  --image-every 400 --prefetch-threads 2 \
  2>&1 | tee "$OUT/flagship_train.log"

python -m cli.evaluate --experiment hourglass8_skeleton \
  --dataset synthetic --synthetic-style stickfigure --n-synthetic 96 \
  --seed 99 --input-size 256 --batch-size 8 \
  --load "$OUT/flagship_ckpt" --plot "$OUT/flagship_pckh.png" \
  2>&1 | tee "$OUT/flagship_eval.log"

echo CHIP_DEMO_DONE
