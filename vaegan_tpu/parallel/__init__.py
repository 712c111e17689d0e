from vaegan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicate_state,
    replicated,
    shard_state,
    state_shardings,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "replicate_state",
    "shard_state", "state_shardings", "make_parallel_train_step",
]
