#!/bin/bash
# Qualitative demo (VERDICT r4 missing #3): cli.predict heatmap grids +
# skeleton overlays on the reference's bundled test photos
# (/root/reference/test_img, read-only), with the round-5 chip-trained
# progressive checkpoint, CRF off and on — one invocation per variant, the
# multi-image mode sharing the restore + jit trace across the whole
# directory. Also renders held-out stick-figure inputs (the distribution
# the checkpoint was trained on — no real MPII/COCO images ship in this
# zero-egress environment) and predicts on them.
#   bash scripts/predict_demo.sh [ckpt] [outdir]
set -ex
cd "$(dirname "$0")/.."
CKPT=${1:-runs_r5/chip_train/progressive_ckpt}
OUT=${2:-runs_r5/predict_demo}
mkdir -p "$OUT"

python -m cli.predict /root/reference/test_img/* \
  --experiment progressive_mpii_final --input-size 256 \
  --load "$CKPT" --out "$OUT"
python -m cli.predict /root/reference/test_img/* \
  --experiment progressive_mpii_final --input-size 256 \
  --load "$CKPT" --crf --out "$OUT" --out-suffix _crf

python scripts/render_holdout_figures.py "$OUT" 3
python -m cli.predict "$OUT"/holdout_fig*.input.png \
  --experiment progressive_mpii_final --input-size 256 \
  --load "$CKPT" --out "$OUT" --out-suffix .pred
echo PREDICT_DEMO_DONE
