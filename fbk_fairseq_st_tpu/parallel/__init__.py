from .mesh import (  # noqa: F401
    batch_axes,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
)
