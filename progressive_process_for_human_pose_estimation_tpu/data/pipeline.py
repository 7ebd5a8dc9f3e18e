"""Host loader + on-device batch renderer.

Division of labour (SURVEY.md §7): the host does ONLY JPEG decode + resize to
a fixed staging size (the reference's Rescale(320) / MPII resize(256) —
/root/reference/train.py:250, 654); *everything else* — crop/flip jitter,
color jitter, Gaussian heatmaps, class-map rasterization — runs inside one
jitted, vmapped XLA program per batch. This replaces the reference's 16-20
DataLoader worker processes doing per-sample PIL work (SURVEY.md §3 hot loop
(b)) with device compute.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..augment import (
    augment_coords,
    augment_image,
    color_jitter,
    resize_coords_plain,
    sample_augment_params,
)
from ..targets import (
    gaussian_heatmaps,
    rasterize_ellipses_1px,
    rasterize_lines,
    rasterize_points,
    rasterize_polygons,
)
from .manifests import Manifest, manifest_kind


def make_coco_batch_fn(
    skeleton: np.ndarray,
    inputsize: int = 256,
    rescale_size: int = 320,
    augment: bool = True,
    render_gauss: bool = True,
    image_method: str = "bilinear",
):
    """Build the jitted COCO-path batch renderer.

    Input (host arrays, batch-leading):
      images: (N, rescale, rescale, 3) float in [0,1] (host pre-resized —
        exactly the reference's Rescale(320) image op)
      keypoints: (N, P, 17, 3); polygons: (N, P, V, 2); n_vertices: (N, P);
      n_persons: (N,); src_dims: (N, 2) original (h, w)
    Output dict: image (N, S, S, 3), keypoint_map / skeleton_map /
      background_map (N, S/4, S/4) int32, gauss_maps (N, S/4, S/4, 17).

    Label semantics follow /root/reference/train.py:282-324: coordinates are
    truncated to ints before drawing; keypoints drawn when v > 0; skeleton
    edges when both endpoints visible; person silhouettes filled with 1.
    """
    map_size = inputsize // 4
    sk = jnp.asarray(skeleton)

    def per_sample(key, image, kps, polys, n_verts, n_person, src_hw):
        p, k, _ = kps.shape
        kp_xy = kps[..., :2]
        vis = kps[..., 2] > 0
        person_mask = jnp.arange(p) < n_person
        vis = vis & person_mask[:, None]

        if augment:
            kg, kc = jax.random.split(key)
            params = sample_augment_params(
                kg, src_hw[0], src_hw[1], rescale_size, inputsize
            )
            # Host already resized the image to rescale_size², so the image
            # gather sees a rescale-identity source; label coordinates use
            # the ORIGINAL dims (the reference scales them by new/src/4).
            img_params = params._replace(
                src_h=jnp.asarray(rescale_size), src_w=jnp.asarray(rescale_size)
            )
            image = augment_image(
                image, img_params, rescale_size, inputsize, method=image_method
            )
            image = color_jitter(image, kc)
            kp_xy = augment_coords(kp_xy, params, rescale_size, inputsize)
            poly_xy = augment_coords(polys, params, rescale_size, inputsize)
        else:
            kp_xy = resize_coords_plain(kp_xy, src_hw[0], src_hw[1], inputsize)
            poly_xy = resize_coords_plain(polys, src_hw[0], src_hw[1], inputsize)
            image = image[:inputsize, :inputsize]

        # Reference truncates to int before drawing (train.py:295-299).
        kp_draw = jnp.trunc(kp_xy)
        edge_valid = vis[:, sk[:, 0]] & vis[:, sk[:, 1]]
        out = {
            "image": image,
            "keypoint_map": rasterize_points(kp_draw, vis, map_size, map_size),
            "skeleton_map": rasterize_lines(
                kp_draw[:, sk[:, 0]], kp_draw[:, sk[:, 1]], edge_valid,
                map_size, map_size,
            ),
            "background_map": rasterize_polygons(
                poly_xy,
                n_verts,
                person_mask & (n_verts > 2),
                map_size,
                map_size,
            ),
        }
        if render_gauss:
            out["gauss_maps"] = gaussian_heatmaps(kp_draw, vis, map_size, map_size)
        return out

    @jax.jit
    def batch_fn(key, images, keypoints, polygons, n_vertices, n_persons, src_dims):
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(per_sample)(
            keys, images, keypoints, polygons, n_vertices, n_persons, src_dims
        )

    return batch_fn


def make_mpii_batch_fn(
    skeleton: np.ndarray, inputsize: int = 256, render_gauss: bool = False
):
    """MPII-path batch renderer (/root/reference/train.py:649-708): plain
    resize, per-joint size-1 ellipses, skeleton lines, head rect scaled into
    map space. Single person per image. ``render_gauss`` adds the baseline
    model's unnormalized σ=1 Gaussian targets drawn from the same /4-space
    coordinates (/root/reference/hourglass_compare.py:718-737)."""
    map_size = inputsize // 4
    sk = jnp.asarray(skeleton)

    def per_sample(image, kps, head_rect, src_hw):
        kp_xy = resize_coords_plain(kps[..., :2], src_hw[0], src_hw[1], inputsize)
        vis = kps[..., 2] > 0
        edge_valid = vis[sk[:, 0]] & vis[sk[:, 1]]
        scale = jnp.stack(
            [
                inputsize / 4.0 / src_hw[1].astype(jnp.float32),
                inputsize / 4.0 / src_hw[0].astype(jnp.float32),
            ]
        )
        rect = head_rect * jnp.concatenate([scale, scale])
        out = {
            "image": image,
            "keypoint_map": rasterize_ellipses_1px(kp_xy, vis, map_size, map_size),
            "skeleton_map": rasterize_lines(
                kp_xy[None, sk[:, 0]], kp_xy[None, sk[:, 1]], edge_valid[None],
                map_size, map_size,
            ),
            "head_rect": rect,
        }
        if render_gauss:
            out["gauss_maps"] = gaussian_heatmaps(
                kp_xy[None], vis[None], map_size, map_size
            )
        return out

    @jax.jit
    def batch_fn(images, keypoints, head_rects, src_dims):
        return jax.vmap(per_sample)(images, keypoints, head_rects, src_dims)

    return batch_fn


class RenderFn:
    """Schema-dispatched batch renderer: one callable interface over the
    COCO/MPII/LSP batch functions so drivers never hard-code a dataset path
    (the round-1 CLIs assumed the COCO schema and crashed on MPII manifests).

    ``staging_size`` is the host-resize edge the paired :class:`HostLoader`
    must use (COCO augment path stages at the Rescale(320) size,
    /root/reference/train.py:250; everything else at the input size).
    """

    def __init__(self, kind: str, staging_size: int, fn, keys,
                 required_channels=None):
        self.kind = kind
        self.staging_size = staging_size
        self._fn = fn
        self._keys = keys
        # Minimum per-stage head channels the rendered class maps demand:
        # (background, skeleton classes, keypoint classes) for class-map
        # schemas, (n_joints,) for the Gaussian-only LSP schema. Drivers
        # validate model heads against this — a keypoint_map holding class
        # K fed to CE over fewer than K+1 logits produces NaN gradients
        # silently (out-of-range gather), which is how a progressive_mpii
        # model trained on COCO-shaped synthetic data failed.
        self.required_channels = required_channels

    def __call__(self, key, host_batch: Dict[str, np.ndarray]):
        args = [jnp.asarray(host_batch[k]) for k in self._keys]
        if self.kind == "coco":
            return self._fn(key, *args)
        return self._fn(*args)  # mpii/lsp paths are deterministic


def make_render_fn(
    manifest: Manifest,
    inputsize: int = 256,
    augment: bool = True,
    render_gauss: bool = True,
    image_method: str = "bilinear",
) -> RenderFn:
    """Build the right jitted renderer for a manifest's schema.

    - coco: full augmentation chain + class maps + Gaussians
      (/root/reference/train.py:204-340);
    - mpii: plain resize, ellipse/line class maps, scaled head rect
      (+ Gaussians for the baseline model) (/root/reference/train.py:649-708,
      hourglass_compare.py:686-770) — augment is ignored, as in the reference;
    - lsp: plain resize + normalized Gaussians
      (/root/reference/data_argumentation.py:10-52).
    """
    kind = manifest_kind(manifest)
    if kind == "coco":
        rescale = inputsize * 320 // 256
        fn = make_coco_batch_fn(
            manifest["skeleton"], inputsize=inputsize, rescale_size=rescale,
            augment=augment, render_gauss=render_gauss, image_method=image_method,
        )
        n_kp = manifest["keypoints"].shape[-2]
        return RenderFn(
            "coco", rescale if augment else inputsize, fn,
            ("images", "keypoints", "polygons", "n_vertices", "n_persons", "src_dims"),
            required_channels=(2, len(manifest["skeleton"]) + 1, n_kp + 1),
        )
    if kind == "mpii":
        from ..models.recursive import MPII_SKELETON

        fn = make_mpii_batch_fn(
            MPII_SKELETON, inputsize=inputsize, render_gauss=render_gauss
        )
        n_kp = manifest["keypoints"].shape[-2]
        return RenderFn(
            "mpii", inputsize, fn, ("images", "keypoints", "head_rects", "src_dims"),
            required_channels=(2, len(MPII_SKELETON) + 1, n_kp + 1),
        )
    fn = make_lsp_batch_fn(inputsize=inputsize)
    return RenderFn("lsp", inputsize, fn, ("images", "keypoints", "src_dims"),
                    required_channels=(manifest["keypoints"].shape[-2],))


class PrefetchLoader:
    """Threaded, prefetching wrapper around :class:`HostLoader`.

    The reference hides its host-side label/augment cost behind 16-20 forked
    DataLoader workers (/root/reference/train.py:821-826). Here the host work
    is only JPEG decode + resize, so a thread pool (PIL releases the GIL in
    its C codecs) plus a bounded prefetch queue keeps the TPU fed: batch i+1
    decodes while batch i trains.
    """

    def __init__(self, loader: "HostLoader", num_threads: int = 8, prefetch: int = 2):
        self.loader = loader
        self.num_threads = num_threads
        self.prefetch = prefetch

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        loader = self.loader
        # queue.Queue treats maxsize<=0 as UNBOUNDED — clamp so prefetch=0
        # ("threaded decode, no lookahead") can't buffer a whole epoch.
        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        SENTINEL = object()
        abort = threading.Event()

        def put(item) -> bool:
            # Bounded put that gives up when the consumer went away (early
            # break / exception in the training loop) so the producer thread
            # never blocks forever on a full queue.
            while not abort.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        # One pool for the whole epoch (round 2 built a fresh pool per
        # batch, paying thread startup every batch). Batches route through
        # HostLoader._load_batch so the native C++ decoder — which decodes
        # the whole batch in one call with its own std::thread pool — is
        # honored; round 2 called _load_image per image and silently
        # dropped `--decode-backend native` back to PIL.
        pool = ThreadPoolExecutor(self.num_threads)

        def producer():
            try:
                # Epoch order/remainder semantics come from HostLoader's own
                # index generator, so the two loaders can never drift.
                for idx in loader._iter_index_batches():
                    batch = loader._pack_batch(idx, loader._load_batch(idx, pool=pool))
                    if not put(batch):
                        return
            except BaseException as e:  # surfaced in the consumer
                put(e)
            finally:
                put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            abort.set()
            t.join()
            pool.shutdown(wait=True)


def make_lsp_batch_fn(inputsize: int = 256, sigma: float = 1.0):
    """LSP-path batch renderer (/root/reference/data_argumentation.py:10-52):
    plain resize, 14-joint NORMALIZED Gaussian heatmaps (1/(2πσ²) form) in
    /4 map space. Single person per image."""
    map_size = inputsize // 4

    def per_sample(image, kps, src_hw):
        kp_xy = resize_coords_plain(kps[..., :2], src_hw[0], src_hw[1], inputsize)
        vis = kps[..., 2] >= 0  # LSP joints.mat flag; reference renders all
        return {
            "image": image,
            "gauss_maps": gaussian_heatmaps(
                kp_xy[None], vis[None], map_size, map_size, sigma=sigma,
                normalized=True,
            ),
        }

    @jax.jit
    def batch_fn(images, keypoints, src_dims):
        return jax.vmap(per_sample)(images, keypoints, src_dims)

    return batch_fn


class HostLoader:
    """Minimal host-side image feeder: decode + staging resize only.

    For a manifest with image files on disk it uses PIL; for synthetic
    manifests (names starting 'synthetic_') it renders blob images. Yields
    dicts of stacked numpy arrays ready for a batch_fn.
    """

    def __init__(
        self,
        manifest: Manifest,
        image_dir: Optional[str] = None,
        batch_size: int = 8,
        staging_size: int = 320,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        decode_backend: str = "pil",
    ):
        self.manifest = manifest
        self.image_dir = image_dir
        self.batch_size = batch_size
        self.staging_size = staging_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder
        # 'native' = C++ libjpeg thread-pool feeder (data/native.py): one C
        # call decodes+resizes the whole batch; falls back to PIL when the
        # library can't build. Decode is the same codec as PIL; resize is
        # Pillow-parity antialiased bicubic (within ~1/255 of Image.resize's
        # default filter — golden-tested in tests/test_native_feeder.py).
        if decode_backend == "native":
            from .native import native_available

            if not native_available():
                decode_backend = "pil"
        self.decode_backend = decode_backend
        # Synthetic images are deterministic per index (seed=idx, fixed
        # keypoints), so their decoded+staged form is cached across epochs —
        # rendering them is the dominant epoch cost of the convergence demos
        # on a slow host. Stored as uint8 (the PIL staging output) to bound
        # memory. All-or-nothing: caching engages only when the WHOLE
        # manifest fits the cap (any eviction policy would thrash at 0% hit
        # rate on a per-epoch full sweep), and inserts are lock-guarded
        # because PrefetchLoader fans _load_image over a thread pool.
        self._synthetic_cache: Dict = {}
        self._synthetic_cache_cap = 1024  # uint8 at 320² staging ≈ 300 MB max
        self._synthetic_cache_lock = threading.Lock()

    def _load_image(self, idx: int):
        """Decode + staging-resize one image; returns (array, (h, w)) with
        the ORIGINAL dims — the label-coordinate scalers need them
        (/root/reference/train.py:655, 676-677), and the real MPII/LSP
        manifests don't record dims (the reference reads them per sample)."""
        name = str(self.manifest["image_names"][idx])
        s = self.staging_size
        if name.startswith(("synthetic_", "synthfig_", "synthfigc_")):
            cached = self._synthetic_cache.get((idx, s))
            if cached is not None:
                staged, hw = cached
                return staged.astype(np.float32) / 255.0, hw

            size = int(self.manifest["image_dims"][idx][0])
            if name.startswith("synthfigc_"):
                from .synthetic import stickfigure_coco_image

                img = stickfigure_coco_image(
                    self.manifest["keypoints"][idx],
                    self.manifest["polygons"][idx],
                    self.manifest["n_vertices"][idx],
                    int(self.manifest["n_persons"][idx]),
                    img_size=size, seed=idx,
                )
            elif name.startswith("synthfig_"):
                from .synthetic import stickfigure_image

                img = stickfigure_image(
                    self.manifest["keypoints"][idx], img_size=size, seed=idx
                )
            else:
                from .synthetic import synthetic_image

                img = synthetic_image(
                    self.manifest["keypoints"][idx], img_size=size, seed=idx
                )
            from PIL import Image

            pil = Image.fromarray((img * 255).astype(np.uint8))
            w, h = pil.size
            staged = np.asarray(pil.resize((s, s)))
            if len(self.manifest["image_names"]) <= self._synthetic_cache_cap:
                with self._synthetic_cache_lock:
                    self._synthetic_cache[(idx, s)] = (staged, (h, w))
            return staged.astype(np.float32) / 255.0, (h, w)
        else:
            from PIL import Image

            pil = Image.open(os.path.join(self.image_dir, name)).convert("RGB")
        w, h = pil.size
        pil = pil.resize((s, s))
        return np.asarray(pil, np.float32) / 255.0, (h, w)

    def _pack_batch(self, idx, loaded):
        batch = {
            "images": np.stack([im for im, _ in loaded]),
            "src_dims": np.asarray([hw for _, hw in loaded], np.int32),
        }
        for key in ("keypoints", "polygons", "n_vertices", "n_persons", "head_rects"):
            if key in self.manifest:
                batch[key] = self.manifest[key][idx]
        return batch

    def __len__(self):
        n = len(self.manifest["image_names"])
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _load_batch(self, idx, pool=None):
        """Decode one batch. The native backend decodes + resizes the whole
        batch in a single C call (its own std::thread pool); the PIL path
        optionally fans out over ``pool`` (a ThreadPoolExecutor — PIL's C
        codecs release the GIL)."""
        names = [str(self.manifest["image_names"][i]) for i in idx]
        if self.decode_backend == "native" and not any(
            nm.startswith(("synthetic_", "synthfig_", "synthfigc_"))
            for nm in names
        ):
            from .native import decode_resize_batch

            images, dims = decode_resize_batch(
                [os.path.join(self.image_dir, nm) for nm in names],
                self.staging_size,
            )
            return [(images[k], tuple(dims[k])) for k in range(len(idx))]
        if pool is not None:
            return list(pool.map(self._load_image, idx))
        return [self._load_image(i) for i in idx]

    def _iter_index_batches(self) -> Iterator[np.ndarray]:
        """One epoch's batch index arrays (shuffle + remainder semantics live
        here, shared by the inline and prefetch iteration paths)."""
        n = len(self.manifest["image_names"])
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        stop = n - n % bs if self.drop_remainder else n
        for start in range(0, stop, bs):
            yield order[start : start + bs]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for idx in self._iter_index_batches():
            yield self._pack_batch(idx, self._load_batch(idx))
