"""linprog_tpu: a TPU-native linear-programming (simplex) framework.

Brand-new JAX/XLA/Pallas re-design with the capability surface of the
reference NumPy library agmuth/linear-programming (see SURVEY.md): primal and
dual revised simplex, two-phase method, bounded-variable simplex, the
primal-dual algorithm, and a general-form front end -- plus what the
reference never had: a fully batched ``vmap`` mode, mesh sharding across TPU
slices, device-side status codes, and an explicit checkpointable solver state.
"""

from .api import (
    BoundedVariablePrimalSimplexSolver,
    DualNaiveSimplexSolver,
    DualRevisedSimplexSolver,
    PhaseOneSimplexSolver,
    PrimalNaiveSimplexSolver,
    PrimalRevisedSimplexSolver,
    SimplexSolver,
)
from .pdhg import PDHGConfig, PDHGSolver
from .primal_dual import PrimalDualAlgorithm
from .config import DEFAULT_CONFIG, SolverConfig
from .engine import SimplexState
from .results import BatchResult, LinProgResult
from .status import (
    BasisIsDualInfeasibleError,
    BasisIsPrimalInfeasibleError,
    DualIsInfeasibleError,
    DualIsUnboundedError,
    LinProgError,
    PrimalIsInfeasibleError,
    PrimalIsUnboundedError,
)

__version__ = "0.1.0"

__all__ = [
    "PrimalNaiveSimplexSolver",
    "PrimalRevisedSimplexSolver",
    "DualNaiveSimplexSolver",
    "DualRevisedSimplexSolver",
    "PhaseOneSimplexSolver",
    "BoundedVariablePrimalSimplexSolver",
    "PrimalDualAlgorithm",
    "PDHGSolver",
    "PDHGConfig",
    "SimplexSolver",
    "SolverConfig",
    "DEFAULT_CONFIG",
    "SimplexState",
    "LinProgResult",
    "BatchResult",
    "LinProgError",
    "BasisIsPrimalInfeasibleError",
    "BasisIsDualInfeasibleError",
    "PrimalIsUnboundedError",
    "PrimalIsInfeasibleError",
    "DualIsUnboundedError",
    "DualIsInfeasibleError",
]
