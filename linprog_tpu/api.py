"""Public solver API (reference-parity class surface).

Thin host wrappers around the functional engine, with the same class names,
constructor signatures and ``solve``/``pivot`` behavior as the reference:

* ``PrimalNaiveSimplexSolver`` / ``PrimalRevisedSimplexSolver``
  (reference ``linprog/primal_solvers.py:10-263``)
* ``DualNaiveSimplexSolver`` / ``DualRevisedSimplexSolver``
  (reference ``linprog/dual_solvers.py:9-120``)
* ``PhaseOneSimplexSolver`` (reference ``linprog/special_solvers.py:11-91``)
* ``SimplexSolver`` general-form driver (reference ``linprog/simplex.py:10-102``)

The naive/revised and primal/dual axes are *configuration*, not an
inheritance diamond: every class binds the same engine with a
``(mode, update)`` pair.  Solver state lives on device between calls, so
``solve(maxiters=1)`` is resumable exactly like the reference (its
Bland-sequence test pattern).  Terminal error statuses are re-raised as the
reference's exceptions.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import engine, forms, phase1
from . import status as st
from .config import DEFAULT_CONFIG, SolverConfig
from .results import LinProgResult


class _SimplexSolverBase:
    """Shared host wrapper: owns problem arrays + a device SimplexState."""

    _mode = "primal"  # "primal" | "dual"
    _update = "eta"  # "eta" | "naive"

    def __init__(self, c, A, b, basis, config: Optional[SolverConfig] = None):
        """Standard form ``min c'x  s.t. Ax = b, x >= 0``; starting basis required.

        Parity: reference ``primal_solvers.py:13-48`` (preprocessing, initial
        inversion, feasibility gate).
        """
        cfg = config or DEFAULT_CONFIG
        self.config = cfg.replace(update=self._update)
        dtype = np.dtype(self.config.dtype)
        c, A, b = forms.preprocess_problem(c, A, b, dtype)
        self.c = jnp.asarray(c)
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b)
        self.m, self.n = A.shape
        self._allowed = jnp.ones((self.n,), jnp.bool_)
        self._state = engine.make_state(self.A, self.b, np.asarray(basis, np.int32))
        if int(self._state.status) == st.NUMERICAL_ERROR:
            raise ValueError(
                "starting basis matrix A[:, basis] is singular"
            )
        self.counter: Optional[int] = None
        self.optimum: Optional[bool] = None
        self._check_basis_feasibility()

    # -- feasibility gates (reference raises at __init__) -------------------
    def _check_basis_feasibility(self):
        if not bool(
            engine.basis_is_primal_feasible(
                self.A, self.b, self._state.basis, self.config.feas_tol
            )
        ):
            raise st.BasisIsPrimalInfeasibleError(
                "starting basis is not primal feasible"
            )

    # -- state views --------------------------------------------------------
    @property
    def basis(self) -> np.ndarray:
        return np.asarray(self._state.basis)

    @property
    def inv_basis_matrix(self) -> np.ndarray:
        return np.asarray(self._state.inv_B)

    @property
    def bfs(self) -> np.ndarray:
        return np.asarray(self._state.bfs)

    @property
    def state(self) -> engine.SimplexState:
        """The explicit, checkpointable solver state pytree."""
        return self._state

    def ranging(self):
        """Sensitivity intervals at the current (optimal) basis.

        Returns :class:`linprog_tpu.ranging.RangingResult` for this
        standard-form problem; call after ``solve()`` reached OPTIMAL
        (ranging at a non-optimal basis reports that basis's stability
        region, which is rarely what you want).
        """
        from .ranging import ranging as _ranging

        return _ranging(self.c, self.A, self.b, self._state)

    # -- operations ---------------------------------------------------------
    def pivot(self, col_in_basis_to_leave_basis: int, col_in_A_to_enter_basis: int):
        """Explicit single pivot (reference ``primal_solvers.py:255-263``)."""
        self._state = engine.pivot_jit(
            self.A,
            self.b,
            self._state,
            jnp.asarray(col_in_basis_to_leave_basis, jnp.int32),
            jnp.asarray(col_in_A_to_enter_basis, jnp.int32),
            self.config,
        )

    def solve(self, maxiters: int = 100) -> LinProgResult:
        """Run up to ``maxiters`` iterations; resumable across calls."""
        state = self._state._replace(
            iters=jnp.zeros((), jnp.int32),
            status=jnp.zeros((), jnp.int32),
        )
        state = engine.run_jit(
            self.c, self.A, self.b, state, self._allowed,
            jnp.asarray(maxiters, jnp.int32), self.config, self._mode,
        )
        code = int(state.status)
        self.counter = int(state.iters)
        self.optimum = code == st.OPTIMAL
        if code == st.RUNNING:
            # iteration cap: soft fail, keep state resumable (parity:
            # reference returns optimum=False without raising).
            self._state = state
        else:
            self._state = state
            st.raise_for_status(code)
        return self._result(state)

    def _result(self, state: engine.SimplexState) -> LinProgResult:
        x = engine.expand_bfs(state, self.n)
        return LinProgResult(
            x=np.asarray(x),
            basis=np.asarray(state.basis),
            cost=float(jnp.dot(self.c, x)),
            iters=int(state.iters),
            optimum=bool(state.status == st.OPTIMAL),
            status=int(state.status),
            y=np.asarray(engine.duals(self.c, state)),
        )


class PrimalNaiveSimplexSolver(_SimplexSolverBase):
    """Primal simplex, Bland's rule, basis re-inverted every pivot.

    Kept mainly as a correctness oracle; the eta-update variant is the fast
    path.  Parity: reference ``primal_solvers.py:10-209``.
    """

    _mode = "primal"
    _update = "naive"


class PrimalRevisedSimplexSolver(_SimplexSolverBase):
    """Primal simplex with product-form-of-the-inverse (rank-1 eta) updates.

    Parity: reference ``primal_solvers.py:212-263``.
    """

    _mode = "primal"
    _update = "eta"


class _DualGateMixin:
    def _check_basis_feasibility(self):
        if not bool(
            engine.basis_is_dual_feasible(
                self.c, self.A, self._state.basis, self.config.feas_tol
            )
        ):
            raise st.BasisIsDualInfeasibleError("starting basis is not dual feasible")


class DualNaiveSimplexSolver(_DualGateMixin, _SimplexSolverBase):
    """Dual simplex, naive basis updates (reference ``dual_solvers.py:9-108``)."""

    _mode = "dual"
    _update = "naive"


class DualRevisedSimplexSolver(_DualGateMixin, _SimplexSolverBase):
    """Dual simplex with eta updates.

    The reference composes this via an MRO diamond
    (``dual_solvers.py:111-120``); here it is just ``(mode=dual, update=eta)``.
    """

    _mode = "dual"
    _update = "eta"


class BoundedVariablePrimalSimplexSolver:
    """Primal simplex with native variable bounds ``lb <= x <= ub``.

    Parity: reference ``linprog/special_solvers.py:94-343``.  The reference's
    dynamic ``lb_nonbasic_vars``/``ub_nonbasic_vars`` index sets become a
    static per-variable status vector (see :mod:`linprog_tpu.bounded`); the
    constructor still accepts the reference's index-set arguments.
    Non-finite bounds are clamped to +/-M via the (overflow-safe) BFS
    magnitude bound, like reference ``special_solvers.py:139-142``.
    """

    def __init__(
        self,
        c,
        A,
        b,
        lb,
        ub,
        basis,
        lb_nonbasic_vars,
        ub_nonbasic_vars,
        config: Optional[SolverConfig] = None,
    ):
        from . import bounded
        from .utils import get_bounds_on_bfs

        self.config = config or DEFAULT_CONFIG
        dtype = np.dtype(self.config.dtype)
        c, A, b = forms.preprocess_problem(c, A, b, dtype)
        lb = np.asarray(lb, dtype=dtype).copy()
        ub = np.asarray(ub, dtype=dtype).copy()
        M = float(get_bounds_on_bfs(A, b))
        lb[np.isneginf(lb)] = -M
        ub[np.isposinf(ub)] = M
        self.m, self.n = A.shape

        var_state = np.full(self.n, int(bounded.AT_LB), dtype=np.int8)
        var_state[np.asarray(ub_nonbasic_vars, dtype=int)] = int(bounded.AT_UB)
        var_state[np.asarray(basis, dtype=int)] = int(bounded.BASIC)

        self.c = jnp.asarray(c)
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b)
        self.lb = jnp.asarray(lb)
        self.ub = jnp.asarray(ub)
        self._state = bounded.make_bounded_state(
            self.A, self.b, self.lb, self.ub, np.asarray(basis, np.int32), var_state
        )
        self.counter: Optional[int] = None
        self.optimum: Optional[bool] = None

    @property
    def basis(self) -> np.ndarray:
        return np.asarray(self._state.basis)

    @property
    def bfs(self) -> np.ndarray:
        return np.asarray(self._state.bfs)

    @property
    def var_state(self) -> np.ndarray:
        return np.asarray(self._state.var_state)

    def pivot(self, *args, **kwargs):
        raise NotImplementedError(
            "`pivot` is fused into `solve` for the bounded-variable engine."
        )

    def solve(self, maxiters: int = 100) -> LinProgResult:
        from . import bounded

        state = self._state._replace(
            iters=jnp.zeros((), jnp.int32), status=jnp.zeros((), jnp.int32)
        )
        state = bounded.run_bounded_jit(
            self.c, self.A, self.b, self.lb, self.ub, state,
            jnp.asarray(maxiters, jnp.int32), self.config,
        )
        self._state = state
        code = int(state.status)
        self.counter = int(state.iters)
        self.optimum = code == st.OPTIMAL
        st.raise_for_status(code)
        x = bounded.expand_bounded_bfs(state, self.lb, self.ub)
        return LinProgResult(
            x=np.asarray(x),
            basis=np.asarray(state.basis),
            cost=float(jnp.dot(self.c, x)),
            iters=self.counter,
            optimum=self.optimum,
            status=code,
        )


class PhaseOneSimplexSolver:
    """Phase-I driver: find a starting basis (reference ``special_solvers.py:11-91``).

    After ``solve()``, ``self.basis`` holds the Phase-II starting basis and
    ``self.A``/``self.b`` the (possibly row-reduced) constraints.
    """

    def __init__(self, c, A, b, config: Optional[SolverConfig] = None):
        self.config = config or DEFAULT_CONFIG
        dtype = np.dtype(self.config.dtype)
        self.c, self.A, self.b = forms.preprocess_problem(c, A, b, dtype)
        self.m, self.n = self.A.shape
        self.basis: Optional[np.ndarray] = None

    def solve(self, maxiters: int = 100) -> None:
        res = phase1.solve_phase1(
            self.c, self.A, self.b, maxiters=maxiters, cfg=self.config
        )
        self.basis = res.basis
        self.A = np.asarray(res.A)
        self.b = np.asarray(res.b)
        self.m = self.A.shape[0]


class SimplexSolver:
    """General-form front end: ``min c'x  s.t. Ax=b, Gx<=h, lb<=x<=ub``.

    The only class callable without a starting basis.  Converts to standard
    form (slack block for ``G``, bound rows for finite ``lb``/``ub``), runs
    Phase I then Phase II, and strips auxiliary variables from the solution.
    Parity: reference ``linprog/simplex.py:10-102`` -- including supporting
    BOTH ``(A, b)`` and ``(G, h)`` together, which is broken in the reference
    (invalid ``np.zeros`` call at ``simplex.py:57``).
    """

    def __init__(
        self,
        c,
        A=None,
        b=None,
        G=None,
        h=None,
        lb=None,
        ub=None,
        config: Optional[SolverConfig] = None,
        bounds_mode: str = "native",
    ):
        if bounds_mode not in ("native", "rows"):
            raise ValueError(f"unknown bounds_mode: {bounds_mode!r}")
        self._bounds_mode = bounds_mode
        self.config = config or DEFAULT_CONFIG
        dtype = np.dtype(self.config.dtype)
        c = np.asarray(c, dtype=dtype).copy()
        n_orig = c.shape[0]
        self.n_orig = n_orig
        self._c_orig = c.copy()

        if lb is None:
            lb = np.zeros(n_orig, dtype=dtype)
        lb = np.asarray(lb, dtype=dtype).copy()
        if ub is None:
            ub = np.full(n_orig, np.inf, dtype=dtype)
        ub = np.asarray(ub, dtype=dtype).copy()

        A = None if A is None else np.atleast_2d(np.asarray(A, dtype=dtype)).copy()
        b = None if b is None else np.asarray(b, dtype=dtype).copy()
        G = None if G is None else np.atleast_2d(np.asarray(G, dtype=dtype)).copy()
        h = None if h is None else np.asarray(h, dtype=dtype).copy()

        # ---- free variables (lb = -inf) ----------------------------------
        # The reference emits a broken inf-rhs row for these
        # (preprocessing.py:49-64).  Here:
        #  * lb=-inf, ub finite: substitute x_j = ub_j - w_j (column negated,
        #    rhs shifted), w_j >= 0;
        #  * lb=-inf, ub=+inf:   split x_j = u_j - v_j with a mirrored
        #    negative column appended for v_j.
        free = np.isneginf(lb)
        self._sub_idx = np.flatnonzero(free & np.isfinite(ub))
        self._split_idx = np.flatnonzero(free & ~np.isfinite(ub))
        self._sub_ub = ub[self._sub_idx].copy()
        for j in self._sub_idx:
            u_j = ub[j]
            if b is not None:
                b -= A[:, j] * u_j
            if h is not None:
                h -= G[:, j] * u_j
            if A is not None:
                A[:, j] *= -1
            if G is not None:
                G[:, j] *= -1
            c[j] *= -1
            lb[j], ub[j] = 0.0, np.inf
        k = self._split_idx.size
        if k:
            if A is not None:
                A = np.concatenate([A, -A[:, self._split_idx]], axis=1)
            if G is not None:
                G = np.concatenate([G, -G[:, self._split_idx]], axis=1)
            c = np.concatenate([c, -c[self._split_idx]])
            lb = np.concatenate([lb, np.zeros(k, dtype=dtype)])
            lb[self._split_idx] = 0.0
            ub = np.concatenate([ub, np.full(k, np.inf, dtype=dtype)])
        self.n_aug = n_orig + k

        # ---- finite nonzero lower bounds: shift x_j = lb_j + w_j ---------
        # Standard form imposes x >= 0, so a finite lb (negative OR positive)
        # is handled by substitution rather than an extra `x_j - s = lb_j`
        # row: rhs shifts by A[:, j] * lb_j, the variable's bounds become
        # [0, ub_j - lb_j].  This (a) makes lb < 0 correct (previously the
        # implicit x >= 0 silently cut off optima with negative x_j),
        # (b) removes one row+column per bounded variable vs bounds_to_rows,
        # and (c) is exact for tiny lb like 1e-9 (bounds_to_rows treated
        # anything within isclose of 0 as 0).
        shift_idx = np.flatnonzero(np.isfinite(lb) & (lb != 0.0))
        self._shift_idx = shift_idx
        self._shift_lb = lb[shift_idx].copy()
        if shift_idx.size:
            if b is not None:
                b = b - A[:, shift_idx] @ self._shift_lb
            if h is not None:
                h = h - G[:, shift_idx] @ self._shift_lb
            ub[shift_idx] = ub[shift_idx] - self._shift_lb
            lb[shift_idx] = 0.0

        # original-row bookkeeping for dual mapping: general_to_standard
        # stacks [A rows; G rows] and then sign-flips rows with negative
        # rhs -- a flipped row's dual is the NEGATED standard-form dual
        m_eq = 0 if (A is None or b is None) else np.atleast_1d(b).shape[0]
        m_ineq = 0 if (G is None or h is None) else np.atleast_1d(h).shape[0]
        self._m_user = m_eq + m_ineq
        rhs_user = np.concatenate(
            [np.atleast_1d(b) if m_eq else np.zeros(0),
             np.atleast_1d(h) if m_ineq else np.zeros(0)]
        )
        self._row_flip = rhs_user < 0

        c_std, A_std, b_std, num_slack = forms.general_to_standard(
            c, A=A, b=b, G=G, h=h, dtype=dtype
        )
        self.num_slack_vars = num_slack
        self.lb = np.concatenate([lb, np.zeros(num_slack, dtype=dtype)])
        self.ub = np.concatenate([ub, np.full(num_slack, np.inf, dtype=dtype)])
        self.c, self.A, self.b = c_std, A_std, b_std
        self.num_vars = self.A.shape[1]

    def _reconstruct_x(self, x_aug: np.ndarray) -> np.ndarray:
        """Map the augmented solution back to the original variable space."""
        x = x_aug[: self.n_orig].copy()
        if self._split_idx.size:
            x[self._split_idx] -= x_aug[self.n_orig : self.n_aug]
        if self._sub_idx.size:
            x[self._sub_idx] = self._sub_ub - x[self._sub_idx]
        if self._shift_idx.size:  # disjoint from sub/split (those set lb=0)
            x[self._shift_idx] += self._shift_lb
        return x

    def solve(self, maxiters1: int = 100, maxiters2: int = 100) -> LinProgResult:
        """Two-phase solve (reference ``simplex.py:79-102``).

        Finite upper bounds route through the NATIVE bounded-variable
        engine (``bounds_mode="native"``, the default): after the
        constructor's lower-bound shift the standard form is
        ``0 <= x <= ub``, which the bounded engine handles without the
        reference's one-row-one-column-per-bound inflation
        (``preprocessing.py:30-69``) -- Phase I is the measured 62% of
        pivots, and bound rows fed it directly.  ``bounds_mode="rows"``
        keeps the reference-parity materialization.
        """
        if self._bounds_mode == "native" and np.isfinite(self.ub).any():
            return self._solve_native_bounds(maxiters1, maxiters2)
        c1, A1, b1 = forms.bounds_to_rows(
            self.c, self.A, self.b, self.lb, self.ub,
            dtype=np.dtype(self.config.dtype),
        )
        p1 = phase1.solve_phase1(c1, A1, b1, maxiters=maxiters1, cfg=self.config)
        solver = PrimalRevisedSimplexSolver(
            c1, p1.A, p1.b, p1.basis, config=self.config
        )
        res = solver.solve(maxiters=maxiters2)
        res.x = self._reconstruct_x(res.x[: self.n_aug])
        res.cost = float(self._c_orig @ res.x)
        res.basis = None  # uninterpretable in the original variable space
        # duals mapped back to the USER's constraint rows (eq rows first,
        # then ineq rows): scatter over Phase-I-dropped redundant rows
        # (their dual is 0), drop bound-row duals, un-flip sign-fixed rows
        if res.y is not None:
            y_full = np.zeros(A1.shape[0])
            keep = np.setdiff1d(
                np.arange(A1.shape[0]), np.asarray(p1.dropped_rows)
            )
            y_full[keep] = res.y
            y_user = y_full[: self._m_user]
            res.y = np.where(self._row_flip, -y_user, y_user)
        return res

    def _solve_native_bounds(
        self, maxiters1: int, maxiters2: int
    ) -> LinProgResult:
        """Bounded-engine dispatch: lb already shifted to 0 in __init__,
        so the standard form is ``0 <= x <= ub`` -- exactly the native
        surface of :func:`linprog_tpu.bounded.solve_bounded_two_phase`."""
        from . import bounded as bnd

        dtype = np.dtype(self.config.dtype)
        x_std, basis, iters, status, y = bnd.solve_bounded_two_phase(
            jnp.asarray(self.c, dtype),
            jnp.asarray(self.A, dtype),
            jnp.asarray(self.b, dtype),
            jnp.asarray(self.lb, dtype),
            jnp.asarray(self.ub, dtype),
            jnp.asarray(maxiters1, jnp.int32),
            jnp.asarray(maxiters2, jnp.int32),
            self.config,
        )
        code = int(status)
        x = self._reconstruct_x(np.asarray(x_std)[: self.n_aug])
        # duals in the user's row space: no bound rows were added and no
        # rows dropped, so only the sign-fix flip needs undoing
        y_user = np.asarray(y)[: self._m_user]
        y_user = np.where(self._row_flip, -y_user, y_user)
        res = LinProgResult(
            x=x,
            basis=None,  # uninterpretable in the original variable space
            cost=float(self._c_orig @ x),
            iters=int(iters),
            optimum=code == st.OPTIMAL,
            status=code,
            y=y_user,
        )
        st.raise_for_status(code)
        return res
