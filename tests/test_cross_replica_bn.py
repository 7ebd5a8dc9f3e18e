"""Cross-replica BatchNorm: bn_axis_name inside shard_map must average batch
statistics across the data axis (SURVEY.md §2.4: cross-chip BN stats via
lax.pmean). Verified against single-device full-batch statistics."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from progressive_process_for_human_pose_estimation_tpu.ops import BatchNorm
from progressive_process_for_human_pose_estimation_tpu.parallel import make_mesh


class TestCrossReplicaBN:
    def test_sharded_stats_match_global(self, rng):
        mesh = make_mesh()
        n_dev = mesh.devices.size
        x = rng.standard_normal((2 * n_dev, 4, 4, 16)).astype(np.float32)

        bn_global = BatchNorm(use_running_average=False)
        v = bn_global.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ref, ref_upd = bn_global.apply(v, jnp.asarray(x), mutable=["batch_stats"])

        bn_x = BatchNorm(use_running_average=False, bn_axis_name="data")

        def shard_fn(xs):
            y, upd = bn_x.apply(v, xs, mutable=["batch_stats"])
            return y, upd["batch_stats"]["bn"]["mean"], upd["batch_stats"]["bn"]["var"]

        f = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=P("data"),
            out_specs=(P("data"), P(), P()),
        )
        y, mean, var = f(jnp.asarray(x))

        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(mean),
            np.asarray(ref_upd["batch_stats"]["bn"]["mean"]),
            rtol=1e-4, atol=1e-6,
        )

    def test_per_replica_stats_differ_without_axis(self, rng):
        # Parity default: per-device statistics (no pmean) — outputs differ
        # from global-batch BN when shards have different distributions.
        mesh = make_mesh()
        n_dev = mesh.devices.size
        x = rng.standard_normal((2 * n_dev, 4, 4, 16)).astype(np.float32)
        x[: x.shape[0] // 2] += 3.0  # skew half the shards

        bn = BatchNorm(use_running_average=False)
        v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ref, _ = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])

        def shard_fn(xs):
            y, _ = bn.apply(v, xs, mutable=["batch_stats"])
            return y

        f = shard_map(shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
        y = f(jnp.asarray(x))
        assert np.abs(np.asarray(y) - np.asarray(ref)).max() > 1e-3
