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
  class): simplex two-phase up to m ~= 192 (measured m=128: simplex 2083
  vs IPM->crossover 1596), IPM -> crossover beyond -- with the
  inverse-factor IPM it wins from m = 256 up (measured B=1024 m=256:
  631 LPs/s 1024/1024 crossed vs simplex 570; m=512: 229 vs 77).  Lanes
  that fail to cross (rare) fall back to an exact two-phase simplex
  solve, so the family's answers are always vertex-exact.
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
import numpy as np

from . import status as st
from .config import SolverConfig, tuned_config
from .results import BatchResult

_FAMILIES = ("simplex", "ipm", "ipm+crossover", "pdhg")

# Measured regime boundaries now live in ONE per-chip data file
# (linprog_tpu/data/calibration.json, VERDICT r3 item 9) -- the module
# constants of rounds 1-3 were frozen v5e-1 measurements that would
# silently mis-route on the next chip.  linprog_tpu.calibration resolves
# the live device's table (env/set_table injectable for tests + porting).
from .calibration import get_table as _calibration_table

def _xover_pallas_max_m() -> int:
    """Mega-kernel fit boundary for the crossover cleanup phases."""
    return int(_calibration_table()["xover_pallas_max_m"])


def exact_cleanup_config(m: int, maxiters: Optional[int] = None):
    """Measured-fastest crossover-cleanup settings: ``(SolverConfig, budget)``.

    One shared source for the exact pipeline (:func:`solve_batch_exact`),
    the IPM straggler recovery (:func:`linprog_tpu.ipm
    .recover_stragglers_pooled`) and the bench legs.  ``m <= 512`` runs the
    whole-segment Pallas mega-kernel at the tuned segment length (measured
    m=256: 643 vs 452 LPs/s over the XLA cleanup).  Larger ``m`` (round 4)
    also routes the repair phases through the Pallas kernels -- the XLA
    batched path ran the m=1024 cleanup at 7.75 LPs/s (VERDICT r3) and its
    dual phase fell back to the vmapped per-lane engine -- with the tight
    refactorization cadence the m=1024 crossover measured necessary
    against eta drift, and a larger pivot budget for bad-guess lanes.
    """
    if m <= _xover_pallas_max_m():
        return tuned_config(m), (maxiters or 512)
    if m < 3072:
        return (
            tuned_config(m, refactor_every=128, unroll=2),
            (maxiters or 2048),
        )
    # blocked-factor stream regime: the round-4 m=4096 probe measured
    # seg=384 / unroll=1 / polish=4 at 0.98 LPs/s, 3/4 crossed at budget
    # 2048 (the tight-128 cadence pays a full 4096^2-factor refactor per
    # 128 pivots and lost ~30%)
    return (
        tuned_config(m, refactor_every=384, unroll=1, polish_pivots=4),
        (maxiters or 2048),
    )


def recovery_cleanup_config(m: int, maxiters: Optional[int] = None):
    """Straggler-recovery variant of :func:`exact_cleanup_config`.

    Recovery buckets start from a near-optimal Tapia-ranked IPM iterate,
    so they rarely need the exact pipeline's full pivot budget or its
    tightest refactor cadence.  Round-5 probe at m=2048 (B=64, 6
    stragglers): r128/unroll2/budget2048 ran 2.06x the raw IPM wall --
    the round-4 miss -- vs r256/unroll2/budget1024 at 1.55x, identical
    recovered counts.  Budget-exhausted lanes keep their IPM answer and
    status (safe degradation), so the smaller budget trades nothing.
    """
    if m >= 1536:
        return (
            tuned_config(m, refactor_every=256, unroll=2),
            (maxiters or 1024),
        )
    return exact_cleanup_config(m, maxiters)


def choose_family(m: int, accuracy: float) -> str:
    """The routing rule alone (exposed for tests / observability).

    Thresholds come from the per-chip calibration table
    (:func:`linprog_tpu.calibration.get_table`)."""
    t = _calibration_table()
    if accuracy >= 1e-4 and m >= t["pdhg_min_m"]:
        return "pdhg"
    if accuracy <= t["exact_eps"]:
        return ("simplex" if m <= t["exact_simplex_max_m"]
                else "ipm+crossover")
    return "simplex" if m <= t["moderate_simplex_max_m"] else "ipm"


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
        res, xinfo = solve_batch_exact(c, G, h, cfg=cfg, maxiters=maxiters)
        info.update(xinfo)
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


def solve_batch_exact(c, G, h, cfg: Optional[SolverConfig] = None,
                      maxiters: Optional[int] = None,
                      guess: str = "tapia"):
    """Exact vertices at Newton-step speed: IPM -> crossover -> fallback.

    The fastest measured EXACT pipeline for ``m >= 256``: batched
    inverse-factor Mehrotra IPM to the f32 KKT floor, the dual-then-primal
    crossover cleanup to an exact verified vertex, and -- for the rare
    lanes that fail to cross -- a gathered two-phase simplex fallback so
    every returned OPTIMAL is vertex-exact with a basis certificate.
    Measured v5e (B=1024, m=n=256, tuned config): 631 LPs/s with
    1024/1024 crossed, max HiGHS gap ~1e-7 -- vs 570 LPs/s for the pure
    simplex pipeline at a 3.1e-6 gap.

    Returns ``(BatchResult, info)`` with ``x`` over the structural
    columns; ``info["crossed"]``/``info["fallback"]`` record the path
    composition.
    """
    import numpy as np

    from .crossover import ipm_crossover_batch_canonical

    B, m, n = G.shape
    if cfg is None:
        cfg, budget = exact_cleanup_config(m, maxiters)
    else:
        budget = maxiters or (512 if m <= _xover_pallas_max_m() else 2048)

    res, crossed = ipm_crossover_batch_canonical(
        c, G, h, crossover_maxiters=budget, cfg=cfg, guess=guess
    )
    crossed_np = np.asarray(crossed)
    info = {"crossed": int(crossed_np.sum()), "fallback": 0,
            "retry_crossed": 0}
    bad = np.flatnonzero(~crossed_np)
    if bad.size == 0:
        return res, info

    retry_plan = None
    if _xover_pallas_max_m() < m < 1536:
        # Beyond the mega-kernel boundary the two-phase fallback is the
        # wrong first tool (round-5 bench: 1.3 s for ONE m=1024 lane).
        # Retry the pipeline on the gathered bucket with the ALTERNATE
        # basis-guess ranking: the round-5 stubborn-lane probe showed
        # this failure mode is a per-lane GUESS pathology, not budget --
        # a lane that burned 4096 Tapia-guess pivots without terminating
        # crossed in NINE pivots from the magnitude guess (tapia and
        # magnitude fail on DIFFERENT lanes; tapia is far better on
        # average, 32/32 vs 26/32 at m=1024).  Above m~1536 the
        # magnitude ranking degrades globally (every probed m=2048
        # straggler budget-exhausted under it) -- no alternate there.
        retry_plan = ("magnitude" if guess == "tapia" else "tapia",
                      budget)
    elif m >= 3072:
        # at this size two-phase cannot converge affordably (measured
        # 35 s iter-limited, uncertifiable); the only repair evidence is
        # BUDGET sensitivity (round 4: 2/4 crossed at 768, 3/4 at 2048)
        # -- retry the same guess with double budget
        retry_plan = (guess, 2 * budget)
    if retry_plan is not None:
        alt, r_budget = retry_plan
        bucket = min(max(8, 1 << int(bad.size - 1).bit_length()), B)
        idx_r = np.resize(bad, bucket)
        res2, crossed2 = ipm_crossover_batch_canonical(
            jnp.take(c, idx_r, axis=0), jnp.take(G, idx_r, axis=0),
            jnp.take(h, idx_r, axis=0),
            crossover_maxiters=r_budget, cfg=cfg, guess=alt,
        )
        crossed2_np = np.asarray(crossed2)
        if crossed2_np.any():
            x = np.array(res.x)
            basis = np.array(res.basis)
            cost = np.array(res.cost)
            iters = np.array(res.iters)
            status = np.array(res.status)
            y = None if res.y is None else np.array(res.y)
            r2x = np.asarray(res2.x)
            r2b = np.asarray(res2.basis)
            r2c = np.asarray(res2.cost)
            r2i = np.asarray(res2.iters)
            r2s = np.asarray(res2.status)
            r2y = None if res2.y is None else np.asarray(res2.y)
            seen = set()
            for k, lane in enumerate(idx_r):
                if lane in seen or not crossed2_np[k]:
                    continue
                seen.add(lane)
                x[lane] = r2x[k, : x.shape[1]]
                basis[lane] = r2b[k]
                cost[lane] = r2c[k]
                iters[lane] = iters[lane] + r2i[k]
                status[lane] = r2s[k]
                if y is not None and r2y is not None:
                    y[lane] = r2y[k]
            res = BatchResult(
                x=jnp.asarray(x), basis=jnp.asarray(basis),
                cost=jnp.asarray(cost), iters=jnp.asarray(iters),
                status=jnp.asarray(status),
                y=None if y is None else jnp.asarray(y),
            )
            info["retry_crossed"] = len(seen)
            info["crossed"] += len(seen)
            bad = np.asarray(
                [l for l in bad if l not in seen], dtype=bad.dtype
            )
    if bad.size == 0:
        return res, info
    if m >= 3072:
        # no affordable exact repair remains at this size (two-phase
        # measured 35 s/attempt WITHOUT converging); the lane keeps its
        # IPM answer and its honest non-crossed status
        info["uncrossed"] = int(bad.size)
        return res, info

    # exact fallback: gather uncrossed lanes into a power-of-two bucket
    # and run the pivot-exact two-phase simplex pipeline on them
    from .batch import solve_batch_two_phase
    from .generators import device_standard_form_batch

    bucket = min(max(8, 1 << int(bad.size - 1).bit_length()), B)
    idx = np.resize(bad, bucket)
    cs, As, bs = device_standard_form_batch(
        jnp.take(c, idx, axis=0), jnp.take(G, idx, axis=0),
        jnp.take(h, idx, axis=0),
    )
    it = 4 * m if m >= 256 else 2000
    sub = solve_batch_two_phase(cs, As, bs, it, it, cfg)
    info["fallback"] = int(bad.size)

    x = np.array(res.x)
    basis = np.array(res.basis)
    cost = np.array(res.cost)
    iters = np.array(res.iters)
    status = np.array(res.status)
    y = None if res.y is None else np.array(res.y)
    sub_x = np.asarray(sub.x)
    sub_basis = np.asarray(sub.basis)
    sub_cost = np.asarray(sub.cost)
    sub_iters = np.asarray(sub.iters)
    sub_status = np.asarray(sub.status)
    # two-phase duals are in the SIGN-FLIPPED row space (the standard-form
    # conversion flips h<0 rows); the crossover/IPM convention is unflipped
    flip = np.asarray(jnp.take(h, idx, axis=0)) < 0
    sub_y = np.where(flip, -np.asarray(sub.y), np.asarray(sub.y))
    for k, lane in enumerate(idx[:bucket]):
        if lane not in bad:
            continue
        x[lane] = sub_x[k, : x.shape[1]]
        basis[lane] = sub_basis[k, : basis.shape[1]]
        cost[lane] = sub_cost[k]
        iters[lane] = iters[lane] + sub_iters[k]
        status[lane] = sub_status[k]
        if y is not None:
            y[lane] = sub_y[k, : y.shape[1]]
    return (
        BatchResult(
            x=jnp.asarray(x), basis=jnp.asarray(basis),
            cost=jnp.asarray(cost), iters=jnp.asarray(iters),
            status=jnp.asarray(status),
            y=None if y is None else jnp.asarray(y),
        ),
        info,
    )


def choose_family_sparse(m: int, n: int, nnz: int, accuracy: float,
                         lanes: int = 1) -> str:
    """Routing rule for shared-pattern SPARSE batches.

    Two families exist at the sparse frontier (VERDICT r4 item 4 asked
    for this entry point): the shared-pattern sparse IPM (eps 1e-3 KKT
    class, a dense ``[B, m, m]`` Cholesky per Newton step -- measured
    38 LPs/s at m=2048/1%, BEATING the sparse PDHG's 36.5 at a 10x
    looser class) and the matrix-free sparse PDHG (eps ~1e-4, no m^2
    memory at all).  Rules:

    * the IPM's dense normal factor needs ``lanes * m^2`` f32 resident
      (~3x that with the inverse factor and pair workspace); past ~4 GiB
      of factors the first-order family is the only one that fits --
      route ``pdhg``.
    * at LOOSE accuracy (>= 1e-2) pick by an explicit work model: the
      IPM pays ~12 Newton steps of a dense ``2 m^3`` factorization
      regardless of sparsity, the PDHG ~``20/accuracy`` iterations of
      ``O(nnz)`` matvecs -- on very sparse patterns the first-order
      family is orders of magnitude less work before its accuracy
      ceiling matters.
    * everything tighter routes ``ipm``: at eps <= 1e-3 the PDHG cannot
      reliably certify, and head-to-head at the benched regime
      (m=2048, 1%, eps 1e-3 vs 1e-4) the sparse IPM measured FASTER at
      the 10x tighter class (38 vs 36.5 LPs/s).
    """
    factor_bytes = 4.0 * lanes * m * m
    if factor_bytes > 4 * 1024**3:
        return "pdhg"
    if accuracy >= 1e-2:
        ipm_work = 12.0 * 2.0 * float(m) ** 3
        pdhg_iters = min(60_000.0, 20.0 / max(accuracy, 1e-6))
        pdhg_work = pdhg_iters * 8.0 * nnz
        if pdhg_work < ipm_work:
            return "pdhg"
    return "ipm"


def solve_batch_auto_sparse(c, rows, cols, vals, h, shape,
                            accuracy: float = 1e-3,
                            maxiters: Optional[int] = None,
                            pattern=None, prefer: Optional[str] = None,
                            recover: Optional[bool] = None):
    """Solve a shared-pattern sparse canonical batch with the best family.

    ``c[B, n], vals[B, nnz], h[B, m]`` over the COO pattern
    ``rows/cols[nnz]`` with ``shape = (m, n)`` -- the common input
    convention of :func:`linprog_tpu.ipm_sparse
    .ipm_solve_batch_sparse_canonical` and
    :func:`linprog_tpu.pdhg.pdhg_solve_batch_sparse`.  Family choice per
    :func:`choose_family_sparse` (override with ``prefer``).

    ``recover`` (default: on for ``accuracy <= 1e-3`` on the IPM path)
    densifies ONLY the straggler bucket and repairs it through the pooled
    dense crossover, so the sparse driver inherits the dense family's
    every-lane answer contract.  Returns ``(BatchResult, info)``.
    """
    m, n = shape
    B = vals.shape[0]
    nnz = int(np.shape(rows)[0]) if hasattr(rows, "shape") else len(rows)
    family = prefer or choose_family_sparse(m, n, nnz, float(accuracy), B)
    info = {"family": f"sparse-{family}", "m": int(m), "n": int(n),
            "lanes": int(B), "nnz": nnz, "accuracy": float(accuracy)}

    if family == "ipm":
        from .ipm import IPMConfig
        from .ipm_sparse import (
            ipm_solve_batch_sparse_canonical,
            recover_stragglers_sparse,
        )

        icfg = IPMConfig(eps_rel=max(float(accuracy), 1e-5),
                         maxiters=maxiters or 60, frac=0.995)
        res = ipm_solve_batch_sparse_canonical(
            c, rows, cols, vals, h, shape, icfg, pattern=pattern
        )
        do_recover = (recover if recover is not None
                      else float(accuracy) <= 1e-3)
        if do_recover:
            res = recover_stragglers_sparse(
                c, rows, cols, vals, h, shape, res
            )
            info["recovered"] = True
        res = res._replace(x=res.x[:, :n])
        info["eps_rel"] = icfg.eps_rel
        return res, info

    if family != "pdhg":
        raise ValueError(f"unknown sparse family {family!r}")
    from .pdhg import PDHGConfig, pdhg_solve_batch_sparse

    lb = jnp.zeros((B, n), jnp.float32)
    ub = jnp.full((B, n), jnp.inf, jnp.float32)
    pcfg = PDHGConfig(eps_rel=max(float(accuracy), 1e-5), adaptive=True,
                      stall_reset_beta=0.95)
    state = pdhg_solve_batch_sparse(
        c, rows, cols, vals, h, 0, lb, ub, shape,
        maxiters=maxiters or 60_000, cfg=pcfg,
    )
    cost = jnp.einsum("bn,bn->b", jnp.asarray(c), state.x)
    res = BatchResult(
        x=state.x,
        basis=jnp.full((B, m), -1, jnp.int32),
        cost=cost,
        iters=state.iters,
        status=state.status,
        y=state.y if hasattr(state, "y") else None,
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
