"""PDHG first-order solver: correctness vs HiGHS, batched mode, diet LP."""

import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu.pdhg import (
    PDHGConfig,
    PDHGSolver,
    pdhg_solve_batch,
)
from linprog_tpu import status as st
from linprog_tpu.generators import random_inequality_lps

CFG = PDHGConfig(eps_rel=1e-5, maxiters=200_000, dtype="float64")


def test_simple_inequality_lp():
    # min -x1 - 2 x2  s.t. x1 + x2 <= 4, x2 <= 2 -> x = (2, 2), cost -6
    res = PDHGSolver(
        c=np.array([-1.0, -2.0]),
        G=np.array([[1.0, 1.0], [0.0, 1.0]]),
        h=np.array([4.0, 2.0]),
        config=CFG,
    ).solve()
    assert res.optimum
    assert res.cost == pytest.approx(-6.0, abs=1e-3)
    assert np.allclose(res.x, [2.0, 2.0], atol=1e-3)


def test_equality_and_bounds():
    # min -x1 s.t. x1 + x2 = 3, 0.5 <= x1 <= 2 -> x1 = 2
    res = PDHGSolver(
        c=np.array([-1.0, 0.0]),
        A=np.array([[1.0, 1.0]]),
        b=np.array([3.0]),
        lb=np.array([0.5, 0.0]),
        ub=np.array([2.0, np.inf]),
        config=CFG,
    ).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(2.0, abs=1e-3)


def test_matches_highs_on_random_lps():
    scipy_opt = pytest.importorskip("scipy.optimize")
    B, m, n = 4, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=21, dtype=np.float64)
    for i in range(B):
        res = PDHGSolver(c=c[i], G=G[i], h=h[i], config=CFG).solve()
        ref = scipy_opt.linprog(
            c[i], A_ub=G[i], b_ub=h[i], bounds=(0, None), method="highs"
        )
        assert ref.status == 0
        assert res.optimum
        assert abs(res.cost - ref.fun) / max(1.0, abs(ref.fun)) < 1e-3


def test_batched_pdhg():
    B, m, n = 6, 8, 12
    c, G, h = random_inequality_lps(B, m, n, seed=3, dtype=np.float64)
    lb = np.zeros((B, n))
    ub = np.full((B, n), np.inf)
    states = pdhg_solve_batch(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), 0,
        jnp.asarray(lb), jnp.asarray(ub), maxiters=100_000, cfg=CFG,
    )
    assert (np.asarray(states.status) == st.OPTIMAL).all()


def test_diet_problem_first_order():
    from tests.test_diet_example import REFERENCE_COST, diet_problem

    c, G, h, lb, ub = diet_problem()
    res = PDHGSolver(c=c, G=G, h=h, lb=lb, ub=ub, config=CFG).solve()
    assert res.optimum
    assert abs(res.cost - REFERENCE_COST) / REFERENCE_COST < 1e-3


def test_batched_canonical_with_autoscaling():
    scipy_ref = pytest.importorskip("scipy.optimize").linprog
    from linprog_tpu.pdhg import pdhg_solve_batch_canonical

    B, m, n = 4, 12, 16
    c, G, h = random_inequality_lps(B, m, n, seed=17, dtype=np.float64)
    cfg = PDHGConfig(eps_rel=1e-5, maxiters=200_000, dtype="float64")
    x, cost, status, iters = pdhg_solve_batch_canonical(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), 200_000, cfg
    )
    assert (np.asarray(status) == st.OPTIMAL).all()
    for i in range(B):
        ref = scipy_ref(c[i], A_ub=G[i], b_ub=h[i], bounds=(0, None),
                        method="highs")
        assert ref.status == 0
        assert abs(float(cost[i]) - ref.fun) / max(1, abs(ref.fun)) < 1e-3


def test_sparse_pdhg_matches_dense():
    from jax.experimental import sparse as jsparse

    from linprog_tpu.pdhg import pdhg_solve_sparse

    rng = np.random.default_rng(3)
    m, n = 40, 60
    # sparse random LP: ~10% density plus a dense-ish diagonal for feasibility
    G = rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.1)
    G[np.arange(m), np.arange(m)] += 1.0
    h = G @ rng.uniform(0, 1, n) + rng.uniform(0.5, 1.5, m)
    y0 = rng.uniform(0, 1, m)
    c = 0.1 + rng.random(n) - G.T @ y0

    cfg = PDHGConfig(eps_rel=1e-6, maxiters=300_000, dtype="float64")
    K = jsparse.BCOO.fromdense(np.asarray(G, dtype=np.float64))
    res = pdhg_solve_sparse(c, K, h, n_eq=0, cfg=cfg)
    assert res.optimum

    dense = PDHGSolver(c=c, G=G, h=h, config=cfg).solve()
    assert dense.optimum
    assert res.cost == pytest.approx(dense.cost, abs=1e-4)

    ref = pytest.importorskip("scipy.optimize").linprog(
        c, A_ub=G, b_ub=h, bounds=(0, None), method="highs"
    )
    assert ref.status == 0
    assert res.cost == pytest.approx(ref.fun, abs=1e-3)


def test_pdhg_detects_primal_infeasible():
    # x1 + x2 = 2 and x1 + x2 <= 1 with x >= 0: infeasible
    cfg = PDHGConfig(eps_rel=1e-6, maxiters=20000)
    s = PDHGSolver(
        np.array([1.0, 1.0]),
        A=np.array([[1.0, 1.0]]), b=np.array([2.0]),
        G=np.array([[1.0, 1.0]]), h=np.array([1.0]),
        config=cfg,
    )
    res = s.solve()
    assert res.status == st.PRIMAL_INFEASIBLE, res.status


def test_pdhg_detects_unbounded():
    # min -x1, x1 - x2 <= 1, x >= 0: ray (1, 1) drives cost to -inf
    cfg = PDHGConfig(eps_rel=1e-6, maxiters=20000)
    s = PDHGSolver(
        np.array([-1.0, 0.0]),
        G=np.array([[1.0, -1.0]]), h=np.array([1.0]),
        config=cfg,
    )
    res = s.solve()
    assert res.status == st.PRIMAL_UNBOUNDED, res.status


def test_pdhg_duals_property():
    s = PDHGSolver(
        np.array([-1.0, -2.0]),
        G=np.array([[1.0, 1.0], [0.0, 1.0]]), h=np.array([4.0, 2.0]),
    )
    res = s.solve()
    assert res.optimum
    y = s.duals
    assert y.shape == (2,)
    # KKT stationarity: c + G'y ~ 0 on the active coordinates (x > 0)
    lam = np.array([-1.0, -2.0]) + np.array([[1.0, 0.0], [1.0, 1.0]]) @ y
    assert np.all(lam > -1e-3)


def test_pdhg_adaptive_not_slower_than_fixed():
    """Adaptive restarts must solve the textbook instance in no more
    iterations (commonly far fewer) than the fixed-cadence scheme."""
    c = np.array([-1.0, -2.0, 0.0])
    G = np.array([[1.0, 1.0, 1.0], [0.5, 2.0, 0.0], [1.0, 0.0, 0.3]])
    h = np.array([4.0, 6.0, 3.0])
    res_a = PDHGSolver(c, G=G, h=h,
                       config=PDHGConfig(adaptive=True)).solve()
    res_f = PDHGSolver(c, G=G, h=h,
                       config=PDHGConfig(adaptive=False)).solve()
    assert res_a.optimum and res_f.optimum
    assert abs(res_a.cost - res_f.cost) < 1e-2 * max(1, abs(res_f.cost))
    assert res_a.iters <= res_f.iters * 1.5


def test_batched_sparse_matches_dense_batch():
    """Shared-pattern sparse batch must agree with the dense batch (same
    iteration, only the matvec representation differs)."""
    from linprog_tpu.pdhg import pdhg_solve_batch_sparse

    rng = np.random.default_rng(5)
    B, m, n = 4, 12, 16
    # build feasible/bounded instances directly from the SPARSE matrix
    mask = rng.random((m, n)) < 0.4
    mask[np.arange(m), rng.integers(0, n, m)] = True  # no empty rows
    G = rng.standard_normal((B, m, n)) * mask[None]
    x0 = rng.random((B, n))
    h = np.einsum("bmn,bn->bm", G, x0) + rng.random((B, m))
    y0 = rng.random((B, m))
    c = 0.1 + 0.9 * rng.random((B, n)) - np.einsum("bmn,bm->bn", G, y0)

    lb = np.zeros((B, n))
    ub = np.full((B, n), np.inf)
    cfg = PDHGConfig(eps_rel=1e-6, maxiters=100_000, dtype="float64")
    dense = pdhg_solve_batch(c, G, h, 0, lb, ub, cfg=cfg)

    rows, cols = np.nonzero(mask)
    vals = G[:, rows, cols]
    sparse = pdhg_solve_batch_sparse(
        c, rows, cols, vals, h, 0, lb, ub, shape=(m, n), cfg=cfg
    )
    assert np.array_equal(np.asarray(dense.status), np.asarray(sparse.status))
    assert (np.asarray(sparse.status) == st.OPTIMAL).all()
    cost_d = np.einsum("bn,bn->b", c, np.asarray(dense.x))
    cost_s = np.einsum("bn,bn->b", c, np.asarray(sparse.x))
    np.testing.assert_allclose(cost_s, cost_d, rtol=1e-4, atol=1e-4)


def test_adaptive_restart_tail_is_bounded():
    """Stall-reset regression: adaptive primal-weight adaptation used to
    random-walk omega to the clip on ~2% of batched lanes (20x iteration
    tails, lockstep vmap pays the max). With the reset, the tail stays
    within a small factor of the median and every lane converges."""
    import jax.numpy as jnp

    from linprog_tpu.pdhg import pdhg_solve_batch_canonical

    B, m, n = 64, 48, 48
    c, G, h = random_inequality_lps(B, m, n, seed=0)
    cfg = PDHGConfig(eps_rel=1e-4, adaptive=True, dtype="float32")
    x, cost, status, iters = pdhg_solve_batch_canonical(
        jnp.asarray(np.asarray(c, np.float32)),
        jnp.asarray(np.asarray(G, np.float32)),
        jnp.asarray(np.asarray(h, np.float32)),
        maxiters=40_000, cfg=cfg)
    it = np.asarray(iters)
    assert (np.asarray(status) == st.OPTIMAL).all()
    assert it.max() < 6 * np.median(it), (int(it.max()), int(np.median(it)))


def test_halpern_matches_highs_and_accelerates():
    """Reflected Halpern acceleration: same optima as the baseline scheme
    (HiGHS-checked) with fewer iterations on a small batch."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    import jax.numpy as jnp

    from linprog_tpu.pdhg import pdhg_solve_batch_canonical

    B, m, n = 16, 24, 32
    c, G, h = random_inequality_lps(B, m, n, seed=3)
    base = PDHGConfig(eps_rel=1e-5, dtype="float32")
    ref = pdhg_solve_batch_canonical(
        jnp.asarray(np.float32(c)), jnp.asarray(np.float32(G)),
        jnp.asarray(np.float32(h)), maxiters=100_000, cfg=base)
    hal = pdhg_solve_batch_canonical(
        jnp.asarray(np.float32(c)), jnp.asarray(np.float32(G)),
        jnp.asarray(np.float32(h)), maxiters=100_000,
        cfg=PDHGConfig(eps_rel=1e-5, dtype="float32", halpern=True))
    for out in (ref, hal):
        assert (np.asarray(out[2]) == st.OPTIMAL).all()
    for i in range(4):
        r = scipy_opt.linprog(c[i], A_ub=G[i], b_ub=h[i], bounds=(0, None),
                              method="highs")
        assert r.status == 0
        assert abs(float(np.asarray(hal[1])[i]) - r.fun) / max(
            1.0, abs(r.fun)) < 1e-3, i
    # acceleration: fewer total iterations than average-restart
    assert np.asarray(hal[3]).sum() < 0.9 * np.asarray(ref[3]).sum()


def test_halpern_certificates():
    cfg = PDHGConfig(eps_rel=1e-6, maxiters=40000, halpern=True)
    res = PDHGSolver(np.array([1.0, 1.0]),
                     A=np.array([[1.0, 1.0]]), b=np.array([2.0]),
                     G=np.array([[1.0, 1.0]]), h=np.array([1.0]),
                     config=cfg).solve()
    assert res.status == st.PRIMAL_INFEASIBLE
    res = PDHGSolver(np.array([-1.0, 0.0]),
                     G=np.array([[1.0, -1.0]]), h=np.array([1.0]),
                     config=cfg).solve()
    assert res.status == st.PRIMAL_UNBOUNDED
