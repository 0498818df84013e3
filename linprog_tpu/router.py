"""Solver-family auto-router: pick simplex / IPM(+crossover) / PDHG by regime.

The framework carries three solver families whose measured throughput
crossover points (v5e-1, f32, dense random ``min c'x, Gx <= h, x >= 0``;
see CLAUDE.md / BENCH_r02.json) are:

==========  =============  ==========  ==================================
size m=n    simplex (LPs/s)  IPM eps=1e-3  winner
==========  =============  ==========  ==================================
128         2083           --          simplex
256         573-589        819-898     IPM at moderate eps; simplex exact
512         72-77          322-331     IPM (4.2x)
1024        7-8            105-109     IPM (13x)
2048        0.60-0.64      24-26       IPM (40x)
==========  =============  ==========  ==================================

The reference (a single-algorithm NumPy library) leaves family choice to
the user; production users want the framework to route.  Rules encoded
here:

* **exact accuracy** (``accuracy <= 1e-5``: vertex + basis certificate
  class): simplex two-phase up to m ~= 384 (it is pivot-exact and its
  mega-kernel peaks there), IPM -> crossover beyond (Newton steps get the
  neighborhood, the dual-then-primal cleanup snaps to the exact vertex).
* **moderate accuracy** (``accuracy > 1e-5``): simplex below m ~= 192
  (tiny LPs amortize nothing), batched IPM with the crossover straggler
  backstop everywhere else.
* **huge + loose** (``m >= 4096`` and ``accuracy >= 1e-4``): batched PDHG
  (first-order; matrix-free streaming).  For SPARSE instances call
  :func:`linprog_tpu.pdhg.pdhg_solve_batch_sparse` directly -- this router
  takes dense batches.

Reference-parity axis: the reference has exactly one driver surface
(``linprog/simplex.py`` ``SimplexSolver``); this is its batched,
multi-family equivalent.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from . import status as st
from .config import SolverConfig, tuned_config
from .results import BatchResult

_FAMILIES = ("simplex", "ipm", "ipm+crossover", "pdhg")

# measured regime boundaries (see module docstring)
_EXACT_SIMPLEX_MAX_M = 384
_MODERATE_SIMPLEX_MAX_M = 192
_PDHG_MIN_M = 4096
_EXACT_EPS = 1e-5


def choose_family(m: int, accuracy: float) -> str:
    """The routing rule alone (exposed for tests / observability)."""
    if accuracy >= 1e-4 and m >= _PDHG_MIN_M:
        return "pdhg"
    if accuracy <= _EXACT_EPS:
        return "simplex" if m <= _EXACT_SIMPLEX_MAX_M else "ipm+crossover"
    return "simplex" if m <= _MODERATE_SIMPLEX_MAX_M else "ipm"


def solve_batch_auto(c, G, h, accuracy: float = 1e-6,
                     maxiters: Optional[int] = None,
                     cfg: Optional[SolverConfig] = None,
                     prefer: Optional[str] = None):
    """Solve a batch of canonical-form LPs with the measured-best family.

    ``c[B, n], G[B, m, n], h[B, m]`` (dense, same shape per lane) for
    ``min c'x  s.t.  Gx <= h, x >= 0``.  ``accuracy`` is the requested
    relative accuracy class: ``<= 1e-5`` means exact vertices with a basis
    certificate (simplex / IPM->crossover), larger values accept interior
    points at that KKT tolerance.  ``prefer`` overrides the choice with an
    explicit family name from ``{"simplex", "ipm", "ipm+crossover",
    "pdhg"}``.

    Returns ``(BatchResult, info)``: ``x`` is always reported over the
    structural ``n`` columns; ``info`` records the family chosen and
    per-family extras (e.g. ``crossed`` lane count).
    """
    B, m, n = G.shape
    family = prefer or choose_family(m, float(accuracy))
    if family not in _FAMILIES:
        raise ValueError(
            f"unknown family {family!r}; expected one of {_FAMILIES}"
        )
    info = {"family": family, "m": int(m), "n": int(n), "lanes": int(B),
            "accuracy": float(accuracy)}

    if family == "simplex":
        from .batch import solve_batch_two_phase
        from .generators import device_standard_form_batch

        scfg = cfg or tuned_config(m)
        it = maxiters or max(2000, 4 * m)
        cs, As, bs = device_standard_form_batch(c, G, h)
        res = solve_batch_two_phase(cs, As, bs, it, it, scfg)
        res = res._replace(x=res.x[:, :n])
        return res, info

    if family == "ipm":
        from .ipm import IPMConfig, ipm_solve_batch_canonical

        icfg = IPMConfig(eps_rel=max(float(accuracy), 1e-5),
                         maxiters=maxiters or 60)
        res = ipm_solve_batch_canonical(c, G, h, icfg, recover=True)
        res = res._replace(x=res.x[:, :n])
        info["eps_rel"] = icfg.eps_rel
        return res, info

    if family == "ipm+crossover":
        from .crossover import ipm_crossover_batch_canonical

        xcfg = cfg or SolverConfig(
            pricing="dantzig", refactor_every=512, polish_pivots=8
        )
        res, crossed = ipm_crossover_batch_canonical(
            c, G, h, crossover_maxiters=maxiters or 512, cfg=xcfg
        )
        info["crossed"] = int(jnp.sum(crossed))
        return res, info

    # pdhg
    from .pdhg import PDHGConfig, pdhg_solve_batch_canonical

    pcfg = PDHGConfig(eps_rel=max(float(accuracy), 1e-5), adaptive=False)
    x, cost, status, iters = pdhg_solve_batch_canonical(
        c, G, h, maxiters=maxiters or 60_000, cfg=pcfg
    )
    res = BatchResult(
        x=x,
        basis=jnp.full((B, m), -1, jnp.int32),
        cost=cost,
        iters=iters,
        status=status,
        y=None,
    )
    info["eps_rel"] = pcfg.eps_rel
    return res, info


def auto_summary(res: BatchResult, info: dict) -> dict:
    """Host-side aggregate for observability (family + lane statuses)."""
    import numpy as np

    s = np.asarray(res.status)
    out = dict(info)
    out["optimal"] = int((s == st.OPTIMAL).sum())
    out["iter_limit"] = int((s == st.ITER_LIMIT).sum())
    return out
