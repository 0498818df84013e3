"""Interior-point (Mehrotra) solver: correctness, duals, crossover composition.

Third solver family -- oracle'd the same way as the PDHG suite: textbook
instances, random-LP parity vs HiGHS (scipy.linprog), dual marginals, and
the IPM -> crossover pipeline landing on an exact vertex.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import status as st
from linprog_tpu.crossover import crossover_batch_canonical
from linprog_tpu.generators import random_inequality_lps
from linprog_tpu.ipm import (
    IPMConfig,
    IPMSolver,
    ipm_solve_batch_canonical,
    ipm_solve_batch_standard,
    ipm_state_to_result,
)

CFG = IPMConfig(eps_rel=1e-7, maxiters=60, dtype="float64")
CFG32 = IPMConfig(eps_rel=1e-3, maxiters=60, dtype="float32")


def test_simple_inequality_lp():
    # min -x1 - 2 x2  s.t. x1 + x2 <= 4, x2 <= 2 -> x = (2, 2), cost -6
    res = IPMSolver(
        c=np.array([-1.0, -2.0]),
        G=np.array([[1.0, 1.0], [0.0, 1.0]]),
        h=np.array([4.0, 2.0]),
        config=CFG,
    ).solve()
    assert res.optimum
    assert res.cost == pytest.approx(-6.0, abs=1e-5)
    assert np.allclose(res.x, [2.0, 2.0], atol=1e-5)


def test_equality_and_bounds():
    # min -x1 s.t. x1 + x2 = 3, 0.5 <= x1 <= 2 -> x1 = 2
    res = IPMSolver(
        c=np.array([-1.0, 0.0]),
        A=np.array([[1.0, 1.0]]),
        b=np.array([3.0]),
        lb=np.array([0.5, 0.0]),
        ub=np.array([2.0, np.inf]),
        config=CFG,
    ).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(2.0, abs=1e-5)
    assert res.x[1] == pytest.approx(1.0, abs=1e-5)


def test_negative_lower_bound_shifted():
    # min x1 s.t. x1 <= 1, x1 >= -2 -> optimum at the negative bound
    res = IPMSolver(
        c=np.array([1.0]),
        G=np.array([[1.0]]),
        h=np.array([1.0]),
        lb=np.array([-2.0]),
        config=CFG,
    ).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(-2.0, abs=1e-5)
    assert res.cost == pytest.approx(-2.0, abs=1e-5)


def test_negative_lb_with_equality_and_ub():
    # min x1 + x2 s.t. x1 + x2 = -1, -3 <= x1 <= 0, 0 <= x2 <= 4
    # any feasible point costs -1; check feasibility mapping back
    res = IPMSolver(
        c=np.array([1.0, 1.0]),
        A=np.array([[1.0, 1.0]]),
        b=np.array([-1.0]),
        lb=np.array([-3.0, 0.0]),
        ub=np.array([0.0, 4.0]),
        config=CFG,
    ).solve()
    assert res.optimum
    assert res.x[0] + res.x[1] == pytest.approx(-1.0, abs=1e-5)
    assert -3.0 - 1e-5 <= res.x[0] <= 1e-5
    assert res.cost == pytest.approx(-1.0, abs=1e-5)


def test_mixed_sign_bounds_match_simplex_driver():
    from linprog_tpu import SimplexSolver

    rng = np.random.default_rng(0)
    n, mG = 6, 8
    lb = np.array([-2.0, -1.0, 0.0, 0.5, -3.0, 0.0])
    ub = np.full(n, 2.0)
    x0 = lb + (ub - lb) * rng.uniform(0.2, 0.8, n)  # strictly inside the box
    G = rng.normal(size=(mG, n))
    h = G @ x0 + rng.uniform(0.1, 1, mG)
    c = rng.normal(size=n)
    r_ipm = IPMSolver(c, G=G, h=h, lb=lb, ub=ub, config=CFG).solve()
    r_simplex = SimplexSolver(c, G=G, h=h, lb=lb, ub=ub).solve()
    assert r_ipm.optimum and r_simplex.optimum
    assert r_ipm.cost == pytest.approx(r_simplex.cost, rel=1e-5, abs=1e-5)


def test_free_variable_rejected():
    with pytest.raises(ValueError, match="free variables"):
        IPMSolver(
            c=np.array([1.0]),
            G=np.array([[1.0]]),
            h=np.array([1.0]),
            lb=np.array([-np.inf]),
        )


def test_matches_highs_on_random_batch():
    scipy_opt = pytest.importorskip("scipy.optimize")
    B, m, n = 8, 12, 16
    c, G, h = random_inequality_lps(B, m, n, seed=7, dtype=np.float64)
    res = ipm_solve_batch_canonical(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), CFG
    )
    for i in range(B):
        ref = scipy_opt.linprog(c[i], A_ub=G[i], b_ub=h[i], method="highs")
        assert ref.status == 0
        assert int(res.status[i]) == st.OPTIMAL
        assert float(res.cost[i]) == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
        # duals: standard form min c'x, Ax=b gives y_i <= 0 on <=-rows at the
        # optimum, the same sign convention as HiGHS ineqlin marginals
        assert np.allclose(
            np.asarray(res.y[i]), ref.ineqlin.marginals, atol=1e-5
        )


def test_iteration_count_is_small():
    # IPM's selling point: tens of Newton steps, independent of instance
    B, m, n = 4, 40, 60
    c, G, h = random_inequality_lps(B, m, n, seed=11, dtype=np.float64)
    res = ipm_solve_batch_canonical(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), CFG
    )
    assert np.all(np.asarray(res.status) == st.OPTIMAL)
    assert np.all(np.asarray(res.iters) < 40)


def test_standard_form_with_negative_rhs_rows():
    # unlike the simplex path the IPM needs no b >= 0 normalization; a row
    # with negative rhs must come back with duals in the caller's row space
    c = np.array([[1.0, 2.0, 0.0]])
    A = np.array([[[1.0, 1.0, 1.0], [-1.0, 0.0, 0.0]]])  # x1+x2+x3=2, -x1=-1
    b = np.array([[2.0, -1.0]])
    state = ipm_solve_batch_standard(
        jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), CFG
    )
    res = ipm_state_to_result(jnp.asarray(c), state)
    assert int(res.status[0]) == st.OPTIMAL
    # x1 = 1 forced; minimize 1*x1 + 2*x2 -> x2 = 0, x3 = 1, cost 1
    assert np.allclose(np.asarray(res.x[0]), [1.0, 0.0, 1.0], atol=1e-6)
    assert float(res.cost[0]) == pytest.approx(1.0, abs=1e-7)


def test_ipm_crossover_lands_on_exact_vertex():
    B, m, n = 6, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=3, dtype=np.float64)
    cj, Gj, hj = jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)
    res = ipm_solve_batch_canonical(cj, Gj, hj, CFG)
    assert np.all(np.asarray(res.status) == st.OPTIMAL)
    # crossover consumes the slack-extended x and returns an exact basis
    crossed_res, crossed = crossover_batch_canonical(
        cj, Gj, hj, res.x[:, :n]
    )
    scipy_opt = pytest.importorskip("scipy.optimize")
    for i in range(B):
        ref = scipy_opt.linprog(c[i], A_ub=G[i], b_ub=h[i], method="highs")
        if bool(crossed[i]):
            assert float(crossed_res.cost[i]) == pytest.approx(
                ref.fun, rel=1e-9, abs=1e-9
            )
    # near-nondegenerate random instances: the basis guess should almost
    # always work -- demand a majority crossed so the test has teeth
    assert int(np.sum(np.asarray(crossed))) >= B // 2


def test_ipm_crossover_pipeline():
    from linprog_tpu.crossover import ipm_crossover_batch_canonical

    B, m, n = 6, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=17, dtype=np.float64)
    merged, crossed = ipm_crossover_batch_canonical(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), CFG
    )
    scipy_opt = pytest.importorskip("scipy.optimize")
    assert int(np.sum(np.asarray(crossed))) >= B // 2
    for i in range(B):
        ref = scipy_opt.linprog(c[i], A_ub=G[i], b_ub=h[i], method="highs")
        tol = dict(rel=1e-9, abs=1e-9) if bool(crossed[i]) else dict(rel=1e-5)
        assert float(merged.cost[i]) == pytest.approx(ref.fun, **tol)


def test_sharded_matches_unsharded():
    from linprog_tpu.parallel import make_batch_mesh, sharded_ipm_batch_canonical

    B, m, n = 8, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=13, dtype=np.float64)
    cj, Gj, hj = jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)
    plain = ipm_solve_batch_canonical(cj, Gj, hj, CFG)
    mesh = make_batch_mesh(8)
    sharded = sharded_ipm_batch_canonical(mesh, cj, Gj, hj, CFG)
    assert np.array_equal(np.asarray(plain.status), np.asarray(sharded.status))
    assert np.allclose(
        np.asarray(plain.cost), np.asarray(sharded.cost), rtol=1e-10, atol=1e-10
    )


def test_infeasible_raises_with_certificate():
    # x1 <= -1 with x >= 0 is infeasible: the diverging dual iterates are
    # detected and the reference exception surface raises (parity with
    # /root/reference/linprog/special_solvers.py:55-59)
    from linprog_tpu.status import PrimalIsInfeasibleError

    solver = IPMSolver(
        c=np.array([1.0]),
        G=np.array([[1.0]]),
        h=np.array([-1.0]),
        config=dataclasses.replace(CFG, maxiters=50),
    )
    with pytest.raises(PrimalIsInfeasibleError):
        solver.solve()
    # the Farkas certificate is available on the solver: y'A <= 0, y'b > 0
    y = solver.duals
    A_std = np.array([[1.0, 1.0]])  # [G | I]
    assert (y @ A_std).max() <= 1e-4
    assert float(np.array([-1.0]) @ y) > 1e-3


def test_batched_ipm_certificates_verify():
    """Batched infeasible + unbounded instances through the IPM path get
    PRIMAL_INFEASIBLE / PRIMAL_UNBOUNDED with machine-verifiable rays
    (round-2 VERDICT item 3)."""
    rng = np.random.default_rng(0)
    B, m, n = 6, 10, 14
    G = rng.normal(size=(B, m, n)).astype(np.float32)
    h = np.abs(rng.normal(size=(B, m))).astype(np.float32) + 1.0
    G[:, 0, :] = 0.0
    G[:, 0, 0] = 1.0
    h[:, 0] = -1.0  # x0 <= -1 with x >= 0: infeasible
    c = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    res = ipm_solve_batch_canonical(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), CFG32
    )
    stt = np.asarray(res.status)
    assert (stt == st.PRIMAL_INFEASIBLE).all()
    y = np.asarray(res.y)
    for i in range(B):
        A = np.concatenate([G[i], np.eye(m, dtype=np.float32)], axis=1)
        assert (y[i] @ A).max() <= 1e-3
        assert float(h[i] @ y[i]) > 1e-3

    # unbounded: min -x0 where column 0 of G is <= 0 (ray e0 improves)
    G2 = rng.normal(size=(B, m, n)).astype(np.float32)
    G2[:, :, 0] = -np.abs(G2[:, :, 0])
    h2 = np.abs(rng.normal(size=(B, m))).astype(np.float32) + 1.0
    c2 = rng.normal(size=(B, n)).astype(np.float32)
    c2[:, 0] = -1.0
    c2[:, 1:] = np.abs(c2[:, 1:])
    res2 = ipm_solve_batch_canonical(
        jnp.asarray(c2), jnp.asarray(G2), jnp.asarray(h2), CFG32
    )
    stt2 = np.asarray(res2.status)
    assert (stt2 == st.PRIMAL_UNBOUNDED).all()
    x = np.asarray(res2.x)
    for i in range(B):
        A = np.concatenate([G2[i], np.eye(m, dtype=np.float32)], axis=1)
        cs = np.concatenate([c2[i], np.zeros(m, np.float32)])
        assert np.abs(A @ x[i]).max() <= 1e-3  # A r = 0
        assert x[i].min() >= -1e-6  # r >= 0
        assert float(cs @ x[i]) < -1e-3  # improving


def test_f32_path_converges_at_f32_tolerance():
    cfg = IPMConfig(eps_rel=1e-3, maxiters=60, dtype="float32")
    B, m, n = 4, 8, 12
    c, G, h = random_inequality_lps(B, m, n, seed=5, dtype=np.float32)
    res = ipm_solve_batch_canonical(
        jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), cfg
    )
    assert np.all(np.asarray(res.status) == st.OPTIMAL)


def test_straggler_recovery_routes_through_crossover():
    """recover=True repairs every lane the f32 IPM leaves non-OPTIMAL at
    its KKT floor to an exact vertex (round-2 VERDICT item 2)."""
    from scipy.optimize import linprog as scipy_linprog

    cfg = IPMConfig(eps_rel=1e-4, maxiters=40, dtype="float32")
    B, m, n = 32, 48, 48
    c, G, h = random_inequality_lps(B, m, n, seed=17, dtype=np.float32)
    c, G, h = jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)
    raw = ipm_solve_batch_canonical(c, G, h, cfg)
    rec = ipm_solve_batch_canonical(c, G, h, cfg, recover=True)
    raw_opt = int((np.asarray(raw.status) == st.OPTIMAL).sum())
    rec_opt = int((np.asarray(rec.status) == st.OPTIMAL).sum())
    assert rec_opt >= raw_opt
    assert rec_opt >= int(0.995 * B)  # the round-3 recovery bar
    # recovered lanes must be TRULY optimal (exact vertices), not relabeled
    stragglers = np.flatnonzero(np.asarray(raw.status) != st.OPTIMAL)
    for i in stragglers:
        if int(np.asarray(rec.status)[i]) != st.OPTIMAL:
            continue
        ref = scipy_linprog(
            np.asarray(c[i]), A_ub=np.asarray(G[i]), b_ub=np.asarray(h[i]),
            bounds=(0, None), method="highs",
        )
        gap = abs(float(rec.cost[i]) - ref.fun) / max(1, abs(ref.fun))
        assert gap < 1e-5
        assert (np.asarray(rec.basis)[i] >= 0).all()  # basis certificate


def test_pooled_straggler_recovery_across_chunks():
    """VERDICT r3 item 3: stragglers from MANY chunks gather into ONE
    crossover bucket (per-chunk tiny-B recovery cost 5.5-11.5x the raw
    solve).  A deliberately starved IPM leaves every lane short; the
    pooled recovery must repair all of them to exact vertices whose costs
    match HiGHS."""
    import jax.numpy as jnp
    from scipy.optimize import linprog as slp

    from linprog_tpu import status as stt
    from linprog_tpu.config import SolverConfig
    from linprog_tpu.generators import random_inequality_lps
    from linprog_tpu.ipm import (
        IPMConfig,
        ipm_solve_batch_canonical,
        recover_stragglers_pooled,
    )

    cfg = IPMConfig(eps_rel=1e-3, maxiters=4)  # starved -> all stragglers
    batches = []
    for s in range(3):
        c, G, h = random_inequality_lps(8, 20, 20, seed=s)
        batches.append((jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)))
    raws = [ipm_solve_batch_canonical(*b, cfg) for b in batches]
    assert all(
        int((np.asarray(r.status) == stt.OPTIMAL).sum()) < 8 for r in raws
    )
    rc = SolverConfig(kernels="xla", pricing="dantzig", refactor_every=64,
                      polish_pivots=8)
    recs = recover_stragglers_pooled(batches, raws, recover_cfg=rc,
                                     maxiters=400)
    for bi, (c, G, h) in enumerate(batches):
        status = np.asarray(recs[bi].status)
        assert (status == stt.OPTIMAL).all(), (bi, status)
        cn, Gn, hn = np.asarray(c), np.asarray(G), np.asarray(h)
        for i in range(8):
            ref = slp(cn[i], A_ub=Gn[i], b_ub=hn[i], bounds=(0, None),
                      method="highs")
            if ref.status == 0:
                gap = abs(float(recs[bi].cost[i]) - ref.fun) / max(
                    1, abs(ref.fun)
                )
                assert gap < 2e-5, (bi, i, gap)


def test_gondzio_correctors_converge_to_same_accuracy():
    """ADVICE r4 (medium): the Gondzio corrector must use a RESIDUAL-FREE
    direction solve -- composing the full-residual closure cancels rb/rc
    twice and distorts the Newton direction.  With the fix, gondzio=2 must
    reach the same f64 KKT class in no more iterations than the baseline."""
    B, m, n = 8, 24, 24
    c, G, h = random_inequality_lps(B, m, n, seed=3, dtype=np.float64)
    c, G, h = jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)
    base = ipm_solve_batch_canonical(c, G, h, CFG)
    gz = ipm_solve_batch_canonical(
        c, G, h, dataclasses.replace(CFG, gondzio=2)
    )
    assert np.all(np.asarray(gz.status) == st.OPTIMAL)
    assert np.allclose(
        np.asarray(gz.cost), np.asarray(base.cost), rtol=1e-6, atol=1e-6
    )
    # the corrector reuses the factorization to EXTEND steps: it must not
    # cost extra Newton iterations anywhere
    assert np.all(np.asarray(gz.iters) <= np.asarray(base.iters) + 1)


def test_warm_start_batch_cuts_iterations():
    """VERDICT r4 item 6: scenario re-solves (new h, same G) restarting
    from the previous iterate with lifted mu must converge in fewer
    Newton steps than a cold start, to the same HiGHS-checked optimum."""
    scipy_opt = pytest.importorskip("scipy.optimize")

    from linprog_tpu.ipm import reoptimize_ipm_batch_canonical

    B, m, n = 8, 24, 24
    c, G, h = random_inequality_lps(B, m, n, seed=13, dtype=np.float64)
    c, G, h = jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)
    base, state = ipm_solve_batch_canonical(c, G, h, CFG,
                                            return_state=True)
    assert np.all(np.asarray(base.status) == st.OPTIMAL)

    rng = np.random.default_rng(0)
    h_new = h * jnp.asarray(1.0 + 0.05 * rng.standard_normal(h.shape))
    warm, wstate = reoptimize_ipm_batch_canonical(
        c, G, h_new, state, CFG, return_state=True
    )
    cold = ipm_solve_batch_canonical(c, G, h_new, CFG)
    assert np.all(np.asarray(warm.status) == st.OPTIMAL)
    # fewer iterations on average, never catastrophically more
    wi = np.asarray(warm.iters, np.float64)
    ci = np.asarray(cold.iters, np.float64)
    assert wi.mean() < ci.mean(), (wi, ci)
    for i in range(B):
        ref = scipy_opt.linprog(np.asarray(c[i]), A_ub=np.asarray(G[i]),
                                b_ub=np.asarray(h_new[i]), method="highs")
        if ref.status == 0:
            assert float(warm.cost[i]) == pytest.approx(
                ref.fun, rel=1e-6, abs=1e-6
            )
    # chained scenarios: warm-start from the warm state
    h3 = h_new * 1.02
    warm2 = reoptimize_ipm_batch_canonical(c, G, h3, wstate, CFG)
    assert np.all(np.asarray(warm2.status) == st.OPTIMAL)


def test_ipm_solver_resolve_warm():
    """IPMSolver.resolve: the general-form warm re-solve surface."""
    solver = IPMSolver(
        c=np.array([-1.0, -2.0]),
        G=np.array([[1.0, 1.0], [0.0, 1.0]]),
        h=np.array([4.0, 2.0]),
        config=CFG,
    )
    r0 = solver.solve()
    assert r0.cost == pytest.approx(-6.0, abs=1e-5)
    r1 = solver.resolve(h=np.array([5.0, 2.0]))
    # new optimum: x = (3, 2), cost -7
    assert r1.optimum
    assert r1.cost == pytest.approx(-7.0, abs=1e-5)
    assert r1.iters <= r0.iters
    # and a cost perturbation on top (chained)
    r2 = solver.resolve(c=np.array([-1.0, -4.0]))
    assert r2.optimum
    assert r2.cost == pytest.approx(-11.0, abs=1e-4)
