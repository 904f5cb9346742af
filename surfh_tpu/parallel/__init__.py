"""Device-mesh sharding of the fusion pipeline.

Two SPMD decompositions (the natural parallelisms of the instrument model,
SURVEY.md §2.6):

* channel-expert (`fusion.ShardedSpectro`): bands → devices, maps
  replicated, one psum per adjoint — the "ep/dp" axis;
* λ-axis (`lambda_sharded.LambdaShardedChannel`): the cube's spectral axis
  → devices, per-plane stages local, one psum in the forward contraction —
  the sequence-parallel axis for cube-domain models.
"""

from .fusion import ShardedSpectro, make_mesh
from .lambda_sharded import LambdaShardedChannel
from .mesh2d import ShardedSpectro2D, make_mesh_2d

__all__ = [
    "LambdaShardedChannel",
    "ShardedSpectro",
    "ShardedSpectro2D",
    "make_mesh",
    "make_mesh_2d",
]
