from drone2d_tpu.parallel.mesh import (
    make_mesh,
    shard_init,
    shard_update,
)

__all__ = ["make_mesh", "shard_init", "shard_update"]
