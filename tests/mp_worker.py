"""Worker for the REAL multi-process integration test (not a test module).

Run as ``python tests/mp_worker.py <process_id> <num_processes> <port>``.
Each process brings up the jax distributed runtime over Gloo on CPU (one
local device per process), takes its disjoint ``host_shard`` of a tiny
manifest, assembles the global batch with ``shard_batch``, and runs ONE
train step whose gradient all-reduce crosses the process boundary. It
prints a RESULT line with the global loss and a post-step parameter
checksum — the test asserts both match across processes (i.e. the hosts
actually trained one synchronized model, SURVEY.md §5 "Distributed
communication backend").
"""

import os
import sys

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from progressive_process_for_human_pose_estimation_tpu.parallel import (  # noqa: E402
    host_shard,
    initialize,
    mesh_for_batch,
    replicated_sharding,
    shard_batch,
)

initialize(f"127.0.0.1:{PORT}", NPROC, PID)
assert jax.process_count() == NPROC, jax.process_count()
assert len(jax.local_devices()) == 1

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from progressive_process_for_human_pose_estimation_tpu.models import (  # noqa: E402
    ProgressiveHourglass,
)
from progressive_process_for_human_pose_estimation_tpu.train import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from progressive_process_for_human_pose_estimation_tpu.train.objectives import (  # noqa: E402
    progressive_objective,
)

LOCAL_BATCH = 1
model = ProgressiveHourglass(
    out_channels=(2, 4, 5), features=8, hourglass_depth=1, dtype=jnp.float32
)
mesh = mesh_for_batch(LOCAL_BATCH)
assert mesh is not None and mesh.devices.size == NPROC

state = create_train_state(
    model, jax.random.PRNGKey(0),
    jnp.zeros((NPROC * LOCAL_BATCH, 32, 32, 3)),
)
state = jax.device_put(state, replicated_sharding(mesh))
step = make_train_step(model, progressive_objective, donate=False)

# Disjoint per-host manifest shard -> per-host DIFFERENT data, so the global
# loss/grads can only agree across processes via the cross-host collective.
idx = host_shard(2 * NPROC, seed=0)
assert len(idx) == 2
rng = np.random.default_rng(1000 + int(idx[0]))
batch = {
    "image": rng.random((LOCAL_BATCH, 32, 32, 3)).astype(np.float32),
    "skeleton_map": rng.integers(0, 4, (LOCAL_BATCH, 8, 8)),
    "keypoint_map": rng.integers(0, 5, (LOCAL_BATCH, 8, 8)),
}
gbatch = shard_batch(batch, mesh)
assert gbatch["image"].shape[0] == NPROC * LOCAL_BATCH

state, metrics = step(state, gbatch)
loss = float(metrics["loss"])
checksum = float(
    sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(state.params)
    )
)
print(f"RESULT pid={PID} loss={loss:.8f} checksum={checksum:.6f}", flush=True)
