"""Worker for the multi-host cli.train integration test (not a test module).

Run as ``python tests/mp_cli_worker.py <pid> <nproc> <port> <workdir>``.
Each process configures the standard multi-host environment variables and
then drives the REAL ``cli.train.main`` twice — a fresh 1-epoch run with a
checkpoint save, and a resumed 2-epoch run (--load) — over a synthetic
manifest that ``build_loader_from_args`` host-shards per process
(parallel/distributed.host_shard; SURVEY.md §5 distributed plan). Prints a
RESULT line with the resumed start epoch and a post-resume parameter
checksum; the test asserts both processes trained one synchronized model
and that process 0 wrote the orbax checkpoint + sidecar files exactly once.
"""

import os
import sys

PID, NPROC, PORT, WORKDIR = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{PORT}"
os.environ["JAX_NUM_PROCESSES"] = str(NPROC)
os.environ["JAX_PROCESS_ID"] = str(PID)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cli import train  # noqa: E402

CKPT = os.path.join(WORKDIR, "ckpt")
COMMON = [
    "--dataset", "synthetic", "--n-synthetic", "8", "--seed", "3",
    "--preset", "progressive_coco", "--features", "8",
    "--hourglass-depth", "1", "--dtype", "float32",
    "--input-size", "32", "--batch-size", "2",
    "--log-every", "1", "--image-every", "0", "--save", CKPT,
]

# Fresh 1-epoch run; parallel.initialize() inside main() picks up the env.
state = train.main(COMMON + ["--epochs", "1"])
assert jax.process_count() == NPROC, jax.process_count()
assert int(state.epoch) == 1

# Per-host manifest shard really was disjoint: 8 synthetic samples over 2
# hosts -> 4 local samples -> 2 steps/epoch at batch 2.
from cli.common import build_loader_from_args  # noqa: E402

args = train.parse_args(COMMON + ["--epochs", "1"])
_manifest, loader = build_loader_from_args(args)
assert len(_manifest["image_names"]) == 8 // NPROC
assert len(loader) == (8 // NPROC) // 2

# Resume: --load continues from epoch 1 into a 2-epoch schedule.
resumed = train.main(COMMON + ["--epochs", "2", "--load", CKPT])
assert int(resumed.epoch) == 2

checksum = float(
    sum(
        float(jax.numpy.sum(jax.numpy.abs(x)))
        for x in jax.tree_util.tree_leaves(resumed.params)
    )
)
print(f"RESULT pid={PID} epoch={int(resumed.epoch)} checksum={checksum:.6f}",
      flush=True)
