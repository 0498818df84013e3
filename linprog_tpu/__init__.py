"""linprog_tpu: a TPU-native linear-programming (simplex) framework.

Brand-new JAX/XLA/Pallas re-design with the capability surface of the
reference NumPy library agmuth/linear-programming (see SURVEY.md): primal and
dual revised simplex, two-phase method, bounded-variable simplex, the
primal-dual algorithm, and a general-form front end -- plus what the
reference never had: a fully batched ``vmap`` mode, mesh sharding across TPU
slices, device-side status codes, and an explicit checkpointable solver state.
"""

import jax as _jax

# MEASURED requirement on TPU (see docs/DESIGN.md): the MXU's default bf16
# matmul passes make reduced costs inaccurate enough to flip pivot selections
# and stop simplex at wrong vertices, and keep PDHG from converging.  Every
# matmul/einsum in the package must therefore run at HIGHEST precision --
# enforced globally here so no code path (XLA fallback, TP, bounded,
# primal-dual) can silently regress.  Explicit ``precision=`` kwargs at the
# Pallas/dot_general call sites remain as local documentation.
_jax.config.update("jax_default_matmul_precision", "highest")

from .api import (
    BoundedVariablePrimalSimplexSolver,
    DualNaiveSimplexSolver,
    DualRevisedSimplexSolver,
    PhaseOneSimplexSolver,
    PrimalNaiveSimplexSolver,
    PrimalRevisedSimplexSolver,
    SimplexSolver,
)
from .crossover import (
    crossover_batch_canonical,
    ipm_crossover_batch_canonical,
    pdhg_crossover_batch_canonical,
)
from .ipm import (
    IPMConfig,
    IPMSolver,
    ipm_solve_batch_canonical,
    ipm_solve_batch_standard,
    recover_stragglers_pooled,
    reoptimize_ipm_batch_canonical,
    warm_start_point,
)
from .ipm_sparse import (
    SparsePattern,
    ipm_solve_batch_sparse_canonical,
    recover_stragglers_sparse,
)
from .pdhg import PDHGConfig, PDHGSolver
from .primal_dual import PrimalDualAlgorithm
from .router import (
    choose_family,
    choose_family_sparse,
    solve_batch_auto,
    solve_batch_auto_sparse,
    solve_batch_exact,
)
from .presolve_host import presolve_problem, solve_with_presolve
from .ranging import RangingResult, ranging, ranging_batch
from .config import DEFAULT_CONFIG, FAST_CONFIG, SolverConfig, tuned_config
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

__version__ = "0.4.0"

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
    "IPMSolver",
    "IPMConfig",
    "ipm_solve_batch_standard",
    "ipm_solve_batch_canonical",
    "recover_stragglers_pooled",
    "reoptimize_ipm_batch_canonical",
    "warm_start_point",
    "SparsePattern",
    "ipm_solve_batch_sparse_canonical",
    "solve_batch_auto",
    "solve_batch_auto_sparse",
    "choose_family_sparse",
    "recover_stragglers_sparse",
    "solve_batch_exact",
    "choose_family",
    "SimplexSolver",
    "SolverConfig",
    "DEFAULT_CONFIG",
    "FAST_CONFIG",
    "tuned_config",
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
    "crossover_batch_canonical",
    "ipm_crossover_batch_canonical",
    "pdhg_crossover_batch_canonical",
    "ranging",
    "ranging_batch",
    "RangingResult",
    "presolve_problem",
    "solve_with_presolve",
]
