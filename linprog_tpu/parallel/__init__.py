from .mesh import (
    batch_sharding,
    make_batch_mesh,
    shard_batch,
    sharded_ipm_batch_canonical,
    sharded_pdhg_batch_canonical,
    sharded_two_phase_solve,
)
from . import distributed
from .tp import make_model_mesh, tp_solve, tp_solve_batch

__all__ = [
    "make_batch_mesh",
    "batch_sharding",
    "shard_batch",
    "sharded_ipm_batch_canonical",
    "sharded_pdhg_batch_canonical",
    "sharded_two_phase_solve",
    "make_model_mesh",
    "tp_solve",
    "tp_solve_batch",
    "distributed",
]
