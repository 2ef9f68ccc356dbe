"""Multi-chip scaling over jax.sharding meshes."""

from lvae_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    make_global_mesh,
)
from lvae_tpu.parallel.mesh import (  # noqa: F401
    ShardedHensmanTrainer,
    make_mesh,
    shard_hensman_state,
    shard_train_data,
)
