"""Multi-chip scaling over jax.sharding meshes."""

from lvae_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_epoch_batches,
    shard_hensman_state,
    shard_train_data,
)
