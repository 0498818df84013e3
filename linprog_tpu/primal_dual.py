"""Primal-dual algorithm (Papadimitriou & Steiglitz restricted-primal loop).

TPU-native rebuild of the reference ``PrimalDualAlgorithm``
(reference ``linprog/special_solvers.py:346-480``):

* start from the dual-feasible ``y = 0``; if ``min(c) < 0``, expand the
  problem with one bounding row ``sum(x) <= n*M`` so ``y = (0,..,min c)`` is
  dual feasible (reference ``special_solvers.py:385-400``, P&S pg. 105);
* loop: admissible set ``J = {j : y'A_j ~= c_j}``; solve the restricted
  primal; if its cost is positive, step the duals by ``theta`` along the
  restricted-dual direction; else complementary slackness holds -> optimal.

Key TPU-first design change: the reference materializes the restricted
primal ``[A_J | I]`` by *fancy-indexing the admissible columns* -- a dynamic
shape per outer iteration.  Here the restricted primal is always the
full-width ``[A | I]`` with an ``allowed`` column mask handed to the engine's
pricing, so every inner solve reuses ONE compiled kernel.  Because
compaction preserves column order, Bland's rule visits the same admissible
columns in the same order, so the pivot sequence matches the reference's.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import engine, forms
from . import status as st
from .config import DEFAULT_CONFIG, SolverConfig
from .results import LinProgResult
from .utils import get_bounds_on_bfs


class PrimalDualAlgorithm:
    """Primal-dual LP algorithm (no starting basis required)."""

    def __init__(self, c, A, b, config: Optional[SolverConfig] = None):
        self.config = config or DEFAULT_CONFIG
        dtype = np.dtype(self.config.dtype)
        self.c, self.A, self.b = forms.preprocess_problem(c, A, b, dtype)
        self.m, self.n = self.A.shape
        self.counter = 0
        self.optimum = False

    def solve(self, maxiters1: int = 100, maxiters2: int = 100) -> LinProgResult:
        cfg = self.config
        dtype = np.dtype(cfg.dtype)
        c, A, b = self.c.copy(), self.A.copy(), self.b.copy()
        m, n = A.shape

        # dual-feasible start: y = 0 needs c >= 0; otherwise append the
        # bounding row sum(x) <= n*M (one extra var + row) and start from
        # y = (0, ..., 0, min c).
        y = np.zeros(m, dtype=dtype)
        expanded = False
        if c.min() < 0:
            expanded = True
            M = float(get_bounds_on_bfs(A, b))
            c = np.concatenate([c, np.zeros(1, dtype=dtype)])
            A = np.block(
                [
                    [A, np.zeros((m, 1), dtype=dtype)],
                    [np.ones((1, n + 1), dtype=dtype)],
                ]
            )
            b = np.concatenate([b, np.array([n * M], dtype=dtype)])
            m, n = A.shape
            y = np.concatenate([y, np.full(1, c.min(), dtype=dtype)])

        # static full-width restricted primal: [A | I] with artificial cost
        A_rp = jnp.asarray(np.concatenate([A, np.eye(m, dtype=dtype)], axis=1))
        c_rp = jnp.concatenate(
            [jnp.zeros(n, dtype=dtype), jnp.ones(m, dtype=dtype)]
        )
        b_dev = jnp.asarray(b)
        c_dev = jnp.asarray(c)
        A_dev = jnp.asarray(A)
        art_allowed = jnp.ones(m, dtype=bool)

        scale = max(1.0, float(np.abs(b).max()) if b.size else 1.0)
        cost_tol = cfg.feas_tol * scale * max(1, m)

        self.counter = 0
        self.optimum = False
        state = None
        admissible = None
        while self.counter < maxiters1:
            self.counter += 1
            # admissible columns: y'A_j ~= c_j (reference uses np.isclose)
            ya = y @ A
            admissible = np.isclose(ya, c, rtol=1e-5, atol=1e-7)
            allowed = jnp.concatenate([jnp.asarray(admissible), art_allowed])

            state = engine.artificial_state(b_dev, n)
            state = engine.run_jit(
                c_rp, A_rp, b_dev, state, allowed,
                jnp.asarray(maxiters2, jnp.int32), cfg, "primal",
            )
            rp_cost = float(engine.current_cost(c_rp, state))

            if rp_cost > cost_tol:
                # restricted dual direction y_r = c_B @ inv_B
                y_r = np.asarray(engine.duals(c_rp, state))
                if np.all(y_r @ np.asarray(A_rp) <= cfg.feas_tol):
                    raise st.DualIsUnboundedError(
                        "restricted dual is unbounded: primal is infeasible"
                    )
                num = c - y @ A
                den = y_r @ A
                with np.errstate(divide="ignore", invalid="ignore"):
                    ratios = np.where(den > cfg.pivot_tol, num / den, np.inf)
                theta = float(np.min(ratios[~admissible]))
                if not np.isfinite(theta):
                    raise st.DualIsUnboundedError(
                        "no admissible dual step: primal is infeasible"
                    )
                y = y + theta * y_r
            else:
                self.optimum = True
                break

        # reconstruct x in the original space: basis entries < n are
        # structural columns of A directly (no compaction bookkeeping).
        basis = np.asarray(state.basis)
        bfs = np.asarray(state.bfs)
        x = np.zeros(n, dtype=dtype)
        structural = basis < n
        x[basis[structural]] = bfs[structural]
        out_basis = np.sort(basis[structural])

        if expanded:
            out_basis = out_basis[out_basis != n - 1]
            x = x[:-1]

        cost = float(self.c @ x)
        return LinProgResult(
            x=x,
            basis=out_basis,
            cost=cost,
            iters=self.counter,
            optimum=self.optimum,
            status=st.OPTIMAL if self.optimum else st.ITER_LIMIT,
        )
