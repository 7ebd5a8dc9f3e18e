#!/bin/bash
# Qualitative demo (VERDICT r4 missing #3): cli.predict heatmap grids +
# skeleton overlays on the reference's bundled test photos
# (/root/reference/test_img, read-only), with the round-5 chip-trained
# progressive checkpoint, CRF off and on.
#   bash scripts/predict_demo.sh [ckpt] [outdir]
set -x
cd "$(dirname "$0")/.."
CKPT=${1:-runs_r5/chip_train/progressive_ckpt}
OUT=${2:-runs_r5/predict_demo}
mkdir -p "$OUT"
for img in /root/reference/test_img/*; do
  base=$(basename "$img"); base=${base%.*}
  python -m cli.predict "$img" \
    --experiment progressive_mpii_final --input-size 256 \
    --load "$CKPT" --out "$OUT/${base}.png"
  python -m cli.predict "$img" \
    --experiment progressive_mpii_final --input-size 256 \
    --load "$CKPT" --crf --out "$OUT/${base}_crf.png"
done
echo PREDICT_DEMO_DONE
