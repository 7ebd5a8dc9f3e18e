"""Golden tests: on-device rasterization vs PIL ImageDraw (the reference's
label renderer, /root/reference/train.py:282-324, 668-690), and Gaussian
heatmaps vs the reference numpy formula (/root/reference/read_mscoco.py:46-65).
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw

import jax.numpy as jnp

from progressive_process_for_human_pose_estimation_tpu.targets import (
    gaussian_heatmaps,
    rasterize_ellipses_1px,
    rasterize_lines,
    rasterize_points,
    rasterize_polygons,
)

H = W = 64


def pil_canvas():
    im = Image.fromarray(np.zeros((H, W)), "L")
    return im, ImageDraw.Draw(im)


class TestPoints:
    def test_random_multi_person(self, rng):
        # COCO-style: P persons × K keypoints, draw.point value k+1
        # (/root/reference/train.py:303-319).
        p_n, k_n = 4, 17
        xy = rng.uniform(-5, W + 5, (p_n, k_n, 2)).astype(np.float32)
        valid = rng.integers(0, 2, (p_n, k_n)).astype(bool)

        im, draw = pil_canvas()
        for p in range(p_n):
            for k in range(k_n):
                if valid[p, k]:
                    x, y = int(np.floor(xy[p, k, 0])), int(np.floor(xy[p, k, 1]))
                    draw.point([x, y], f"rgb({k + 1}, {k + 1}, {k + 1})")
        golden = np.array(im)

        ours = np.asarray(rasterize_points(jnp.asarray(xy), jnp.asarray(valid), H, W))
        np.testing.assert_array_equal(ours, golden)

    def test_overwrite_order(self):
        # Two keypoints on the same pixel: later (higher k) wins.
        xy = np.array([[[10.0, 10.0], [10.2, 10.7]]], np.float32)
        valid = np.ones((1, 2), bool)
        ours = np.asarray(rasterize_points(jnp.asarray(xy), jnp.asarray(valid), H, W))
        assert ours[10, 10] == 2

    def test_person_order(self):
        # Same keypoint index, two persons on one pixel: later person wins —
        # same value, but exercise the seq encoding with different k.
        xy = np.array([[[5.0, 5.0]], [[5.0, 5.0]]], np.float32)
        valid = np.ones((2, 1), bool)
        ours = np.asarray(rasterize_points(jnp.asarray(xy), jnp.asarray(valid), H, W))
        assert ours[5, 5] == 1


class TestEllipses:
    def test_random_mpii_style(self, rng):
        # MPII: per-joint size-1 ellipse, fill i+1
        # (/root/reference/train.py:680-686). Stay >=1 px inside the border:
        # PIL's ellipse has an idiosyncratic skip when the whole box is in the
        # doubly-negative corner (documented in raster.py).
        k_n = 16
        centers = rng.uniform(1.0, W - 2.0, (k_n, 2)).astype(np.float32)
        valid = rng.integers(0, 2, (k_n,)).astype(bool)

        im, draw = pil_canvas()
        for i in range(k_n):
            if valid[i]:
                x, y = centers[i]
                draw.ellipse(
                    (x - 0.5, y - 0.5, x + 0.5, y + 0.5),
                    fill=f"rgb({i + 1}, {i + 1}, {i + 1})",
                )
        golden = np.array(im)
        ours = np.asarray(
            rasterize_ellipses_1px(jnp.asarray(centers), jnp.asarray(valid), H, W)
        )
        np.testing.assert_array_equal(ours, golden)


class TestLines:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_multi_person_edges(self, seed):
        rng = np.random.default_rng(seed)
        p_n, e_n = 3, 15
        a = rng.uniform(0, W - 1, (p_n, e_n, 2)).astype(np.float32)
        b = rng.uniform(0, W - 1, (p_n, e_n, 2)).astype(np.float32)
        valid = rng.integers(0, 2, (p_n, e_n)).astype(bool)

        im, draw = pil_canvas()
        for p in range(p_n):
            for e in range(e_n):
                if valid[p, e]:
                    draw.line(
                        [a[p, e, 0], a[p, e, 1], b[p, e, 0], b[p, e, 1]],
                        f"rgb({e + 1}, {e + 1}, {e + 1})",
                    )
        golden = np.array(im)
        ours = np.asarray(
            rasterize_lines(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid), H, W)
        )
        np.testing.assert_array_equal(ours, golden)

    def test_line_exits_canvas(self):
        a = np.array([[[-10.0, 5.0]]], np.float32)
        b = np.array([[[80.0, 40.0]]], np.float32)
        valid = np.ones((1, 1), bool)
        im, draw = pil_canvas()
        draw.line([-10, 5, 80, 40], "rgb(1, 1, 1)")
        golden = np.array(im)
        ours = np.asarray(
            rasterize_lines(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid), H, W, max_steps=160
            )
        )
        np.testing.assert_array_equal(ours, golden)


def random_simple_polygon(rng, n_verts, cx, cy, rmin=3, rmax=20):
    """Star-convex polygon: random radii at sorted angles — simple (non-self-
    intersecting), arbitrary vertex count, like COCO silhouettes."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    radii = rng.uniform(rmin, rmax, n_verts)
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    return np.stack([xs, ys], axis=1).astype(np.float32)


class TestPolygons:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_star_polygons(self, seed):
        # PIL's fill is reproduced exactly up to (a) an insertion-order parity
        # quirk in its corner rule and (b) float32 FMA-contraction differences
        # at exact .5 boundaries — both sub-1e-4 pixel-rate effects (see
        # raster.py docstring). Allow <=2 stray pixels per composite image.
        rng = np.random.default_rng(100 + seed)
        p_n, v_max = 3, 24
        verts = np.zeros((p_n, v_max, 2), np.float32)
        n_verts = rng.integers(3, v_max + 1, (p_n,))
        for p in range(p_n):
            verts[p, : n_verts[p]] = random_simple_polygon(
                rng, n_verts[p], rng.uniform(15, 48), rng.uniform(15, 48)
            )
        valid = np.ones((p_n,), bool)

        im, draw = pil_canvas()
        for p in range(p_n):
            poly = [float(v) for v in verts[p, : n_verts[p]].reshape(-1)]
            draw.polygon(poly, fill="#010101")
        golden = np.array(im)
        ours = np.asarray(
            rasterize_polygons(
                jnp.asarray(verts), jnp.asarray(n_verts), jnp.asarray(valid), H, W
            )
        )
        n_diff = int((ours != golden).sum())
        assert n_diff <= 2, f"{n_diff} pixels diverge from PIL"

    @pytest.mark.slow
    def test_fixed_shapes(self):
        cases = [
            [4, 1, 30, 30, 1, 30],                 # triangle with top tip
            [1, 1, 20, 1, 20, 8, 1, 8],            # axis-aligned rect
            [1, 10, 10, 1, 19, 10, 10, 19],        # diamond (pass-through verts)
            [0, 0, 4, 16, 8, 4, 12, 16, 16, 0],    # W shape (non-convex)
        ]
        for poly in cases:
            im, draw = pil_canvas()
            draw.polygon(poly, fill="#010101")
            golden = np.array(im)
            verts = np.array(poly, np.float32).reshape(1, -1, 2)
            ours = np.asarray(
                rasterize_polygons(
                    jnp.asarray(verts),
                    jnp.asarray([verts.shape[1]]),
                    jnp.asarray([True]),
                    H,
                    W,
                )
            )
            np.testing.assert_array_equal(ours, golden, err_msg=f"poly={poly}")

    def test_invalid_polygon_ignored(self):
        verts = np.array([[[1, 1], [20, 1], [20, 20]]], np.float32)
        ours = np.asarray(
            rasterize_polygons(
                jnp.asarray(verts), jnp.asarray([3]), jnp.asarray([False]), H, W
            )
        )
        assert ours.sum() == 0


class TestGaussian:
    def test_reference_formula_int_centers(self, rng):
        # /root/reference/read_mscoco.py:46-65 (unnormalized, integer centers,
        # accumulated over persons).
        p_n, k_n = 3, 17
        centers = rng.integers(0, W, (p_n, k_n, 2)).astype(np.float32)
        valid = rng.integers(0, 2, (p_n, k_n)).astype(bool)

        golden = np.zeros((k_n, H, W), np.float64)
        sigma = 1
        x_map = np.tile(np.arange(W), (H, 1))
        y_map = x_map.T
        for p in range(p_n):
            for k in range(k_n):
                if valid[p, k]:
                    temp = (
                        (x_map - centers[p, k, 0]) ** 2 + (y_map - centers[p, k, 1]) ** 2
                    ) / (2 * sigma**2)
                    golden[k] += np.exp(-temp)

        ours = np.asarray(
            gaussian_heatmaps(jnp.asarray(centers), jnp.asarray(valid), H, W, sigma=1.0)
        )
        np.testing.assert_allclose(
            np.transpose(ours, (2, 0, 1)), golden, rtol=1e-5, atol=1e-6
        )

    def test_normalized_lsp_form(self, rng):
        # /root/reference/data_argumentation.py:37-50.
        centers = rng.uniform(0, W, (1, 14, 2)).astype(np.float32)
        valid = np.ones((1, 14), bool)
        ours = np.asarray(
            gaussian_heatmaps(
                jnp.asarray(centers), jnp.asarray(valid), H, W, sigma=1.0, normalized=True
            )
        )
        unnorm = np.asarray(
            gaussian_heatmaps(jnp.asarray(centers), jnp.asarray(valid), H, W, sigma=1.0)
        )
        np.testing.assert_allclose(ours, unnorm / (2 * np.pi), rtol=1e-4, atol=1e-7)

    def test_peak_location(self):
        centers = np.array([[[10.0, 20.0]]], np.float32)
        valid = np.ones((1, 1), bool)
        hm = np.asarray(gaussian_heatmaps(jnp.asarray(centers), jnp.asarray(valid), H, W))
        assert np.unravel_index(hm[:, :, 0].argmax(), (H, W)) == (20, 10)
        np.testing.assert_allclose(hm[20, 10, 0], 1.0, rtol=1e-6)


def test_line_with_far_offcanvas_endpoint_matches_pil():
    """A line whose major extent exceeds max_steps (h+w) must still draw its
    visible span (the bounded step window shifts to the on-canvas range)."""
    from PIL import Image, ImageDraw

    from progressive_process_for_human_pose_estimation_tpu.targets import (
        rasterize_lines,
    )

    h = w = 64
    cases = [((-500.0, 10.0), (40.0, 10.0)),   # horizontal from far left
             ((40.0, 10.0), (-500.0, 10.0)),   # same, reversed
             ((10.0, 900.0), (10.0, 20.0)),    # vertical from far below
             ((-300.0, -200.0), (50.0, 40.0))]  # diagonal from far corner
    for a, b in cases:
        img = Image.new("I", (w, h), 0)
        ImageDraw.Draw(img).line([tuple(map(int, a)), tuple(map(int, b))],
                                 fill=1, width=1)
        golden = (np.asarray(img) > 0)

        p0 = jnp.asarray([[a]], jnp.float32)
        p1 = jnp.asarray([[b]], jnp.float32)
        ours = np.asarray(rasterize_lines(p0, p1, jnp.ones((1, 1), bool), h, w))
        np.testing.assert_array_equal(ours > 0, golden, err_msg=f"{a}->{b}")
