"""Device-mesh sharding of the fusion pipeline (channel-expert SPMD)."""

from .fusion import ShardedSpectro, make_mesh

__all__ = ["ShardedSpectro", "make_mesh"]
