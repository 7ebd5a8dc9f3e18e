"""cli.validate — the dataset_check equivalent
(/root/reference/dataset_check.py:108-118): must pass clean data and catch
injected degenerate samples (missing file, invisible-joints sample)."""

import os

import numpy as np
import pytest

from tests.test_manifest_mat import make_release_mat
from tests.test_real_data_e2e import write_jpegs


class TestValidate:
    def test_clean_synthetic_passes(self):
        from cli import validate

        report = validate.main(
            ["--dataset", "synthetic", "--n-synthetic", "6",
             "--batch-size", "2", "--input-size", "64"]
        )
        assert report["failures"] == 0
        assert report["rendered"] == 6

    def test_catches_degenerate_samples(self, tmp_path):
        from cli.validate import validate_manifest
        from progressive_process_for_human_pose_estimation_tpu.data import (
            HostLoader,
            build_mpii_manifest,
            make_render_fn,
        )

        mat = str(tmp_path / "release.mat")
        make_release_mat(mat, n_images=10)
        m = build_mpii_manifest(mat)
        img_dir = str(tmp_path / "images")
        names = [str(n) for n in m["image_names"]]
        write_jpegs(img_dir, names)

        # degenerate sample 1: delete one image file (decode failure)
        os.remove(os.path.join(img_dir, names[0]))
        # degenerate sample 2: make every joint invisible (empty label map)
        m["keypoints"][1, :, 2] = 0.0

        render = make_render_fn(m, inputsize=32, augment=False)
        loader = HostLoader(m, image_dir=img_dir, batch_size=1, shuffle=False,
                            staging_size=render.staging_size,
                            drop_remainder=False)
        report = validate_manifest(m, loader, render)
        assert report["failures"] == 2
        reasons = {idx: r for idx, r in report["failure_list"]}
        assert "decode failed" in reasons[0]
        assert "empty keypoint label map" in reasons[1]

    def test_cli_exit_code_on_failure(self, tmp_path, monkeypatch):
        from cli import validate

        mat = str(tmp_path / "release.mat")
        make_release_mat(mat, n_images=10)
        img_dir = str(tmp_path / "images")
        write_jpegs(img_dir, [f"img_{i:03d}.jpg" for i in range(10)])
        os.remove(os.path.join(img_dir, "img_000.jpg"))

        with pytest.raises(SystemExit):
            validate.main(
                ["--dataset", "mpii", "--mpii-mat", mat, "--image-dir", img_dir,
                 "--input-size", "32"]
            )
