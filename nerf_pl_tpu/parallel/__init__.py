from .mesh import (initialize_distributed, local_shard_size, make_mesh,
                   replicate, shard_map, shard_rays)

__all__ = ["initialize_distributed", "make_mesh", "shard_rays", "replicate",
           "local_shard_size", "shard_map"]
