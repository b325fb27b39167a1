"""Multi-device scale-out: mesh-sharded Gram assembly, distributed
blocked Cholesky/solves, sharded posterior evaluation."""

from .mesh import make_1d_mesh, make_mesh, replicated, row_sharding
from .gram import sharded_gram
from .cholesky import (
    distributed_chol_solve,
    distributed_cholesky,
    distributed_cholesky_2d,
    distributed_cholesky_cyclic,
    distributed_tri_solve,
)
from .extend import DistributedCholFactor
from .iterative import DistributedIterativeGPRegressor, distributed_gram_matvec
from .posterior import sharded_posterior_eval
from .solve import DistributedConditioner, distributed_condition

__all__ = [
    "make_mesh",
    "make_1d_mesh",
    "row_sharding",
    "replicated",
    "sharded_gram",
    "distributed_cholesky",
    "distributed_cholesky_2d",
    "distributed_cholesky_cyclic",
    "distributed_chol_solve",
    "distributed_tri_solve",
    "DistributedCholFactor",
    "DistributedIterativeGPRegressor",
    "distributed_gram_matvec",
    "sharded_posterior_eval",
    "distributed_condition",
    "DistributedConditioner",
]
