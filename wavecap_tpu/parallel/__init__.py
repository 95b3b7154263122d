"""Mesh/sharding utilities: stream x time mesh, halo exchange, grid demod."""

from .mesh import make_mesh
from .sharded import (
    ShardedGridConfig,
    GridState,
    GridControl,
    grid_init,
    control_init,
    sharded_grid_step,
)

__all__ = [n for n in dir() if not n.startswith("_")]
