from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    ray_sharding,
    replicate,
    shard_batch,
)
from .render import make_sharded_render  # noqa: F401
