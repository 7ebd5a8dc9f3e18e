"""Exercise the .mat-based manifest builders against synthetic fixtures
written with scipy.io.savemat (no real LSP/MPII data in this image)."""

import numpy as np
import pytest
import scipy.io

from progressive_process_for_human_pose_estimation_tpu.data import (
    build_lsp_manifest,
    build_mpii_manifest,
)


class TestLSPManifest:
    def test_joints_mat_roundtrip(self, tmp_path, rng):
        # LSP joints.mat: (3, 14, N) [x; y; flag] (data_argumentation.py:14).
        n = 5
        joints = rng.uniform(0, 200, (3, 14, n))
        path = str(tmp_path / "joints.mat")
        scipy.io.savemat(path, {"joints": joints})
        m = build_lsp_manifest(path)
        assert m["keypoints"].shape == (n, 14, 3)
        assert list(m["image_names"][:2]) == ["im0001.jpg", "im0002.jpg"]
        np.testing.assert_allclose(m["keypoints"][2, 5, 0], joints[0, 5, 2], rtol=1e-6)
        np.testing.assert_allclose(m["keypoints"][2, 5, 1], joints[1, 5, 2], rtol=1e-6)


def make_release_mat(path, n_images=6):
    """Synthetic MPII RELEASE struct: images 0,2 single-person with
    annopoints + head rect (kept); 1 multi-person (dropped); 3 no annopoints
    (dropped); 4 not training (dropped); 5 single-person kept."""

    def point(pid, x, y, vis):
        return {"id": pid, "x": x, "y": y, "is_visible": vis}

    def rect(with_points=True):
        r = {"x1": 10.0, "y1": 20.0, "x2": 50.0, "y2": 60.0}
        if with_points:
            pts = np.empty((3,), object)
            pts[0] = point(0, 5.0, 6.0, 1)
            pts[1] = point(7, 15.0, 16.0, 0)
            pts[2] = point(15, 25.0, 26.0, np.array([]))  # empty -> visible
            r["annopoints"] = {"point": pts}
        return r

    annolist = np.empty((n_images,), object)
    for i in range(n_images):
        entry = {"image": {"name": f"img_{i:03d}.jpg"}}
        if i == 1:
            rects = np.empty((2,), object)
            rects[0] = rect()
            rects[1] = rect()
            entry["annorect"] = rects  # multiple persons -> dropped
        elif i == 3:
            entry["annorect"] = rect(with_points=False)
        else:
            entry["annorect"] = rect()
        annolist[i] = entry

    img_train = np.ones((n_images,), np.int64)
    img_train[4] = 0
    scipy.io.savemat(
        path,
        {"RELEASE": {"annolist": annolist, "img_train": img_train, "act": np.zeros(1)}},
    )


class TestMPIIManifest:
    def test_single_person_filter_and_points(self, tmp_path):
        path = str(tmp_path / "release.mat")
        make_release_mat(path)
        m = build_mpii_manifest(path)
        # kept: images 0, 2, 5 (single person, annopoints, training)
        assert list(m["release_indices"]) == [0, 2, 5]
        assert list(m["image_names"]) == ["img_000.jpg", "img_002.jpg", "img_005.jpg"]
        kp = m["keypoints"][0]
        np.testing.assert_allclose(kp[0], [5.0, 6.0, 1.0])   # visible
        np.testing.assert_allclose(kp[7], [15.0, 16.0, 0.0])  # is_visible == 0
        np.testing.assert_allclose(kp[15], [25.0, 26.0, 1.0])  # empty -> visible
        assert kp[3].tolist() == [0.0, 0.0, 0.0]  # unannotated joint zeroed
        np.testing.assert_allclose(m["head_rects"][0], [10, 20, 50, 60])
