"""Render held-out stick-figure photos as PNG inputs for cli.predict.

The qualitative demo on /root/reference/test_img shows the full predict
workflow on the reference's bundled real photos, but the only trainable data
in this environment is synthetic (zero egress — no MPII/COCO downloads), so
a stick-figure-trained checkpoint cannot transfer to real photos. These
renders are drawn from an UNSEEN seed (99, the held-out eval convention of
scripts/chip_train_demo.sh) so predictions on them demonstrate the trained
model + predict CLI end-to-end where the training distribution applies.

    python scripts/render_holdout_figures.py [outdir] [n]
"""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from progressive_process_for_human_pose_estimation_tpu.data.synthetic import (
    stickfigure_image,
    synthetic_person_pose,
)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "runs_r5/predict_demo"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    size = 256
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(99)
    for i in range(n):
        kps = synthetic_person_pose(rng, size)
        img = stickfigure_image(kps, size, seed=1000 + i)
        path = os.path.join(out, f"holdout_fig{i}.input.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
        print(path)


if __name__ == "__main__":
    main()
