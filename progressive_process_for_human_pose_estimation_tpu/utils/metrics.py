"""Observability: TensorBoard scalars/images + loss-curve PNGs + stdout.

Mirrors the reference's training telemetry (SURVEY.md §2.2.14):

- tensorboardX scalars 'Loss'/'Loss_2'/'Loss_3' every 50 iters under
  ``runs/<experiment>`` (/root/reference/train.py:796-797, 906-910);
- rendered image/mask/skeleton/keypoint grids every 100 iters — argmax →
  matplotlib colormap → grid (/root/reference/train.py:931-956);
- matplotlib loss/accuracy curve PNGs named ``<stem>loss.png``
  (/root/reference/train.py:71-72, try_with_torch.py:356-358);
- console progress lines (/root/reference/train.py:912-914).

Uses torch.utils.tensorboard (pure event-file writer; no GPU torch needed).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def colorize_class_map(class_map: np.ndarray, n_classes: int = 20) -> np.ndarray:
    """argmax class map (H, W) int → RGB via a matplotlib colormap, like the
    reference's ScalarMappable(Normalize(0, 20)) (train.py:938-951)."""
    from matplotlib.cm import ScalarMappable
    from matplotlib.colors import Normalize

    cm = ScalarMappable(Normalize(0, n_classes))
    return cm.to_rgba(class_map)[..., :3].astype(np.float32)


def make_grid(images: np.ndarray, pad: int = 2) -> np.ndarray:
    """(N, H, W, 3) → one (H', W', 3) grid image (torchvision.utils.make_grid
    equivalent for our NHWC arrays)."""
    n, h, w, c = images.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * (h + pad) + pad, cols * (w + pad) + pad, c), np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = images[i]
    return grid


class DeviceLossTrace:
    """Per-step loss history accumulated ON DEVICE — zero host readbacks in
    the step loop (each record is two dispatched ops: a stack and a buffer
    write), one ``device_get`` at save time materializes the whole history.

    Parity target: the reference saves per-STEP loss record arrays inside
    every checkpoint (/root/reference/try_with_aspp.py:359-421, 402-406 —
    ``record_loss_1..4`` appended every iteration). A host-side append would
    pay a blocking readback per step, which serializes the remote-TPU tunnel
    (the same pathology the global-step log cadence fix removed); this
    buffer keeps the per-step record exactly and pays nothing until save.
    """

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self.keys = None
        self.buf = None  # (n_keys, capacity) device array
        self.n = 0
        self._set = None

    def _setter(self):
        # One jitted dispatch per step; the buffer is donated where the
        # backend supports it so the write is in place (eager `.at[].set`
        # copies the whole buffer every step — O(steps²) HBM traffic on
        # long runs). The axon remote-TPU tunnel hangs on donated
        # executables, so donation is gated the same way as the train step.
        if self._set is None:
            import jax

            from ..train.loop import donation_supported

            donate = (0,) if donation_supported() else ()
            self._set = jax.jit(
                lambda buf, vals, i: buf.at[:, i].set(vals),
                donate_argnums=donate,
            )
        return self._set

    def record(self, gstep: int, metrics) -> None:
        if self.capacity <= 0 or gstep >= self.capacity:
            return
        import jax.numpy as jnp

        vals = {k: v for k, v in metrics.items() if k != "finite"}
        live_keys = sorted(vals)
        if self.keys is None:
            self.keys = live_keys
            self.buf = jnp.zeros((len(self.keys), self.capacity), jnp.float32)
        elif live_keys != self.keys:
            # Prefilled keys disagree with the live objective's metrics
            # (e.g. resume under a different objective): rebuild on the live
            # key set, carrying over the rows both share.
            old_keys, old_buf = self.keys, self.buf
            self.keys = live_keys
            self.buf = jnp.zeros((len(self.keys), self.capacity), jnp.float32)
            for i, k in enumerate(self.keys):
                if k in old_keys:
                    self.buf = self.buf.at[i].set(old_buf[old_keys.index(k)])
        stacked = jnp.stack(
            [jnp.asarray(vals[k], jnp.float32) for k in self.keys]
        )
        self.buf = self._setter()(self.buf, stacked, gstep)
        self.n = max(self.n, gstep + 1)

    def prefill(self, history, expected_steps: int) -> bool:
        """Seed from a loaded ``loss_history`` dict on resume.

        Alignment is only sound when the loaded arrays really are per-step
        records of the steps this run resumes after — i.e. every array has
        exactly ``expected_steps`` entries (same batch size, per-step
        provenance). Anything else (a pre-trace log-cadence history, a
        changed batch size) would leave zero gaps or stale tails, so the
        trace DISABLES itself and the caller's log-cadence fallback applies.
        Returns True when seeded.
        """
        if not history or expected_steps <= 0:
            return False
        import jax.numpy as jnp
        import numpy as np

        arrays = {k: np.asarray(v, np.float32).ravel() for k, v in history.items()}
        if any(a.size != expected_steps for a in arrays.values()) \
                or expected_steps > self.capacity:
            self.capacity = 0  # disable: record() becomes a no-op
            return False
        self.keys = sorted(arrays)
        self.buf = jnp.zeros((len(self.keys), self.capacity), jnp.float32)
        for i, k in enumerate(self.keys):
            self.buf = self.buf.at[i, :expected_steps].set(arrays[k])
        self.n = expected_steps
        return True

    def history(self):
        """{name: np.ndarray of per-step values} — ONE device readback."""
        if self.keys is None:
            return {}
        import jax
        import numpy as np

        host = np.asarray(jax.device_get(self.buf))
        return {k: host[i, : self.n] for i, k in enumerate(self.keys)}


class MetricLogger:
    """Scalar/image logging with the reference's cadence and names."""

    def __init__(self, logdir: Optional[str] = None, experiment: str = "experiment"):
        self.experiment = experiment
        self.writer = None
        if logdir is not None:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(logdir, experiment))
        self.loss_history: Dict[str, list] = {}

    def log_scalars(self, step: int, metrics: Dict[str, float]) -> None:
        names = {"loss": "Loss", "loss_1": "Loss_1", "loss_2": "Loss_2",
                 "loss_3": "Loss_3", "accuracy": "accuracy"}
        for k, v in metrics.items():
            v = float(v)
            self.loss_history.setdefault(k, []).append(v)
            if self.writer is not None:
                self.writer.add_scalar(names.get(k, k), v, step)

    def log_images(
        self,
        step: int,
        image: np.ndarray,
        stage_outputs: Sequence[np.ndarray],
        n_classes: int = 20,
    ) -> None:
        """image (N,H,W,3); stage_outputs: list of (N,h,w,C) logits — rendered
        as argmax colormap grids under the reference's tag names
        (train.py:953-956)."""
        if self.writer is None:
            return
        self.writer.add_image("image", make_grid(image), step, dataformats="HWC")
        tags = ["mask", "skeleton", "keypoints"]
        for tag, out in zip(tags, stage_outputs):
            cls = np.argmax(out, axis=-1)
            rgb = np.stack([colorize_class_map(c, n_classes) for c in cls])
            self.writer.add_image(tag, make_grid(rgb), step, dataformats="HWC")

    def print_progress(self, epoch: int, epochs: int, i: int, total: int, loss):
        print(f"[{epoch}/{epochs}][{i}/{total}] Loss: {float(loss)}")

    def save_loss_curve(self, path: str, key: str = "loss") -> None:
        """<stem>loss.png equivalent (try_with_torch.py:356-358)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(self.loss_history.get(key, []))
        ax.set_xlabel("step")
        ax.set_ylabel(key)
        fig.savefig(path)
        plt.close(fig)

    def save_accuracy_curve(self, path: str, thresholds, accuracy) -> None:
        """PCKh detection-rate curve plot (train.py:1140-1145)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(np.asarray(thresholds), np.asarray(accuracy) * 100)
        ax.set_xticks(np.arange(0, 0.55, 0.05))
        ax.set_yticks(np.arange(0, 101, 10))
        ax.set_xlabel("Normalized distance")
        ax.set_ylabel("Detection rate, %")
        fig.savefig(path)
        plt.close(fig)

    def close(self):
        if self.writer is not None:
            self.writer.close()
