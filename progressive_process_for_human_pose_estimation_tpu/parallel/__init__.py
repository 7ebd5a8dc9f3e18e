from .distributed import (  # noqa: F401
    host_batches_to_global,
    host_shard,
    initialize,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    mesh_for_batch,
    mesh_rule,
    replicate_to_mesh,
    replicated_sharding,
    shard_batch,
)
