from .mesh import (
    init_distributed,
    is_master,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
