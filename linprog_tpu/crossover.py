"""First-order -> simplex crossover: snap approximate solutions to vertices.

PDHG (:mod:`linprog_tpu.pdhg`) converges to ~1e-4..1e-6 KKT residuals in
f32 but never lands on an exact basic solution; the reference's simplex
family always terminates at a vertex with a basis certificate.  This
module combines them, the way PDLP pairs its first-order solver with a
crossover step: take the approximate ``x``, guess the optimal basis (the
``m`` largest components of ``[x; s]`` -- near a non-degenerate vertex
those are exactly the basic variables), factorize it, and run a handful
of batched simplex cleanup pivots.  Lanes whose guess is primal feasible
finish in a few pivots with machine-precision objectives and a dual
certificate; the rest are reported (``crossed == False``) and keep their
first-order answer.

Everything is batched and on-device: top-k basis guess, batched
factorization, and the same batched engine the two-phase driver uses.

Reference parity axis: the reference has no first-order family at all --
this is the capability its users would need to trust one (exception
surface + exact optima, ``/root/reference/linprog/simplex.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import engine
from . import status as st
from .batch import _run_chunked, _to_result
from .config import DEFAULT_CONFIG, SolverConfig
from .results import BatchResult

_HIGHEST = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("cfg",))
def crossover_batch_canonical(c, G, h, x, maxiters=512,
                              cfg: SolverConfig = DEFAULT_CONFIG,
                              indicator=None):
    """Polish approximate solutions of ``min c'x, Gx <= h, x >= 0``.

    ``c[B, n], G[B, m, n], h[B, m]``; ``x[B, n]`` the approximate primal
    points (any first-order output).  Returns ``(BatchResult, crossed)``
    where ``crossed[B]`` marks lanes that reached a verified optimal
    basis.  Lanes whose basis guess is singular or primal infeasible get
    ``status == BASIS_PRIMAL_INFEASIBLE`` and ``crossed == False``; the
    caller decides whether to fall back to a full two-phase solve.

    ``indicator`` (optional, ``[B, n+m]`` over the slack-extended space)
    overrides the basis-guess ranking: the m largest entries are taken as
    basic.  An interior-point caller should pass the Tapia indicator
    ``x/s`` (primal over dual slack) -- at a noisy f32 interior point it
    separates basic from nonbasic variables far more sharply than the
    primal magnitudes alone.

    The standard form used here keeps the rows UNFLIPPED (``A = [G I]``,
    ``b = h``): a from-basis solve needs no sign normalization, only a
    primal-feasible start.
    """
    B, m, n = G.shape
    dt = G.dtype
    eye = jnp.broadcast_to(jnp.eye(m, dtype=dt), (B, m, m))
    As = jnp.concatenate([G, eye], axis=2)  # [B, m, n+m]
    cs = jnp.concatenate([c, jnp.zeros((B, m), dt)], axis=1)

    # slack values at the approximate point; tiny PDHG infeasibilities
    # clamp to 0 so ranking is by magnitude of the intended basic value
    s = h - jnp.einsum("bmn,bn->bm", G, x, precision=_HIGHEST)
    xs = jnp.concatenate([jnp.maximum(x, 0.0), jnp.maximum(s, 0.0)], axis=1)
    if indicator is not None:
        xs = indicator

    # ---- basis guess: the m largest components of [x; s] -----------------
    _, idx = jax.lax.top_k(xs, m)  # [B, m]
    basis = jnp.sort(idx, axis=1).astype(jnp.int32)

    Bmat = jnp.take_along_axis(As, basis[:, None, :], axis=2)  # [B, m, m]
    inv_B = jnp.linalg.inv(Bmat)
    bfs0 = jnp.einsum("bij,bj->bi", inv_B, h, precision=_HIGHEST)

    finite = jnp.all(jnp.isfinite(inv_B), axis=(1, 2)) & jnp.all(
        jnp.isfinite(bfs0), axis=1
    )
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(h), axis=1))
    feasible = finite & jnp.all(
        bfs0 >= -cfg.feas_tol * scale[:, None], axis=1
    )

    states = engine.SimplexState(
        basis=basis,
        inv_B=inv_B,
        bfs=jnp.maximum(bfs0, 0.0),
        iters=jnp.zeros((B,), jnp.int32),
        status=jnp.where(
            feasible, st.RUNNING, st.BASIS_PRIMAL_INFEASIBLE
        ).astype(jnp.int32),
    )

    allowed = jnp.ones((n + m,), jnp.bool_)
    states = _run_chunked(cs, As, h, states, allowed, maxiters, cfg, "primal")

    # exact terminal solve (same accuracy pass as the two-phase driver)
    B_final = jnp.take_along_axis(As, states.basis[:, None, :], axis=2)
    bfs_exact = jnp.linalg.solve(B_final, h[:, :, None])[:, :, 0]
    ok = jnp.all(jnp.isfinite(bfs_exact), axis=1)
    states = states._replace(
        bfs=jnp.where(ok[:, None], bfs_exact, states.bfs),
        status=jnp.where(ok, states.status, st.NUMERICAL_ERROR).astype(
            jnp.int32
        ),
    )

    res = _to_result(cs, states, n + m)
    crossed = res.status == st.OPTIMAL
    return (
        BatchResult(
            x=res.x[:, :n],
            basis=res.basis,
            cost=jnp.sum(c * res.x[:, :n], axis=1),
            iters=res.iters,
            status=res.status,
            y=res.y,
        ),
        crossed,
    )


def pdhg_crossover_batch_canonical(c, G, h, pdhg_maxiters: int = 20_000,
                                   crossover_maxiters: int = 512,
                                   cfg: SolverConfig = DEFAULT_CONFIG,
                                   pdhg_cfg=None):
    """Batched PDHG + crossover: first-order speed, simplex-exact optima.

    Runs :func:`pdhg.pdhg_solve_batch_canonical` (Ruiz-equilibrated PDHG),
    then :func:`crossover_batch_canonical` at the PDHG points.  Where the
    crossover verifies an optimal basis the exact vertex result replaces
    the first-order one; elsewhere the PDHG answer is kept (its status
    tells why).  Returns ``(BatchResult, crossed)``.

    A loosely-converged PDHG run (even ITER_LIMIT) often still identifies
    the optimal support -- crossover is attempted for every lane that has
    a finite iterate.
    """
    from .pdhg import DEFAULT_PDHG_CONFIG, pdhg_solve_batch_canonical

    # fixed-cadence restarts for the BATCHED first-order stage: vmap runs
    # lanes in lockstep, and adaptive primal-weight adaptation measured a
    # 4.2x straggler tail (max 17.7k vs 4.2k iters at B=1024, m=256 -->
    # 4x wall); the crossover only needs an approximate support anyway
    pdhg_cfg = pdhg_cfg or DEFAULT_PDHG_CONFIG.__class__(
        eps_rel=DEFAULT_PDHG_CONFIG.eps_rel, adaptive=False
    )
    x, cost, status, iters = pdhg_solve_batch_canonical(
        c, G, h, maxiters=pdhg_maxiters, cfg=pdhg_cfg
    )
    x = jnp.where(jnp.all(jnp.isfinite(x), axis=1)[:, None], x, 0.0)
    res, crossed = crossover_batch_canonical(
        c, G, h, x, maxiters=crossover_maxiters, cfg=cfg
    )
    merged = BatchResult(
        x=jnp.where(crossed[:, None], res.x, x),
        basis=res.basis,  # meaningful only where crossed
        cost=jnp.where(crossed, res.cost, cost),
        iters=iters + res.iters,
        status=jnp.where(crossed, res.status, status).astype(jnp.int32),
        y=res.y,
    )
    return merged, crossed


def ipm_crossover_batch_canonical(c, G, h, ipm_cfg=None,
                                  crossover_maxiters: int = 512,
                                  cfg: SolverConfig = DEFAULT_CONFIG):
    """Batched interior-point + crossover: Newton-step speed, exact optima.

    Runs :func:`linprog_tpu.ipm.ipm_solve_batch_canonical` (6-10 Newton
    iterations per lane), then crosses over at the interior point.  Where
    the crossover verifies an optimal basis the exact vertex result
    replaces the interior one; elsewhere the IPM answer is kept.
    Returns ``(BatchResult, crossed)``.

    Measured (f32, 128 lanes, m=n=128): magnitude ranking crosses 80/128;
    the Tapia indicator ``x/s`` from the terminal state crossed 77/128 --
    no better, because the terminal state restores the best-KKT iterate,
    which sits mid-path where ``x/s`` is not yet sharply separated.  The
    default magnitude guess is therefore used; pass ``indicator`` to
    :func:`crossover_batch_canonical` directly to experiment.
    """
    from .ipm import DEFAULT_IPM_CONFIG, ipm_solve_batch_standard

    ipm_cfg = ipm_cfg or DEFAULT_IPM_CONFIG
    B, m, n = G.shape
    dt = G.dtype
    eye = jnp.broadcast_to(jnp.eye(m, dtype=dt), (B, m, m))
    As = jnp.concatenate([G, eye], axis=2)
    cs = jnp.concatenate([c, jnp.zeros((B, m), dt)], axis=1)
    state = ipm_solve_batch_standard(cs, As, h, ipm_cfg)
    x = state.x[:, :n].astype(dt)
    x = jnp.where(jnp.all(jnp.isfinite(x), axis=1)[:, None], x, 0.0)
    res, crossed = crossover_batch_canonical(
        c, G, h, x, maxiters=crossover_maxiters, cfg=cfg,
    )
    ipm_cost = jnp.sum(cs * state.x, axis=1).astype(dt)
    merged = BatchResult(
        x=jnp.where(crossed[:, None], res.x, x),
        basis=res.basis,  # meaningful only where crossed
        cost=jnp.where(crossed, res.cost, ipm_cost),
        iters=state.iters + res.iters,
        status=jnp.where(crossed, res.status, state.status).astype(jnp.int32),
        y=res.y,
    )
    return merged, crossed
