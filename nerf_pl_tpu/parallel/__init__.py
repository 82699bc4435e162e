from .mesh import make_mesh, shard_rays, replicate, local_shard_size, shard_map

__all__ = ["make_mesh", "shard_rays", "replicate", "local_shard_size", "shard_map"]
