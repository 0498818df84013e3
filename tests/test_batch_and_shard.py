"""Batched and sharded solving: lane consistency, HiGHS oracle, mesh parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import SolverConfig
from linprog_tpu.batch import (
    batch_summary,
    solve_batch_from_basis,
    solve_batch_two_phase,
)
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch
from linprog_tpu.parallel import make_batch_mesh, sharded_two_phase_solve
from linprog_tpu import status as st
from tests.problems import PRIMAL_PROBLEMS


def test_batched_lanes_match_single_solves():
    """Pad the textbook problems into one batch; every lane must match its
    known optimum (the per-lane correctness oracle under vmap)."""
    from linprog_tpu import forms

    m_pad = max(p.A.shape[0] for p in PRIMAL_PROBLEMS)
    n_pad = max(p.A.shape[1] for p in PRIMAL_PROBLEMS) + m_pad
    cs, As, bs = [], [], []
    for p in PRIMAL_PROBLEMS:
        c, A, b, _, _ = forms.pad_problem(
            p.c.astype(np.float32), p.A.astype(np.float32),
            p.b.astype(np.float32), m_pad, n_pad,
        )
        cs.append(c)
        As.append(A)
        bs.append(b)
    res = solve_batch_two_phase(
        jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(As)),
        jnp.asarray(np.stack(bs)), 200, 200,
    )
    status = np.asarray(res.status)
    assert (status == st.OPTIMAL).all()
    for i, p in enumerate(PRIMAL_PROBLEMS):
        expected = float(p.c[p.optimal_basis] @ p.optimal_bfs)
        assert np.asarray(res.cost)[i] == pytest.approx(expected, abs=1e-3)


def test_batched_vs_highs_oracle():
    scipy_linprog = pytest.importorskip("scipy.optimize").linprog
    B, m, n = 12, 16, 24
    c, G, h = random_inequality_lps(B, m, n, seed=11)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cfg = SolverConfig(pricing="dantzig", refactor_every=30)
    res = solve_batch_two_phase(
        jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs), 500, 500, cfg
    )
    summary = batch_summary(res)
    assert summary["optimal"] == B, summary
    ours = np.asarray(res.cost)
    for i in range(B):
        ref = scipy_linprog(
            c[i], A_ub=G[i], b_ub=h[i], bounds=(0, None), method="highs"
        )
        assert ref.status == 0
        assert abs(ours[i] - ref.fun) / max(1.0, abs(ref.fun)) < 5e-5


def test_batched_detects_infeasible_lane():
    # lane 0 infeasible (-x1 - x2 = 1), lane 1 feasible
    c = np.zeros((2, 2), np.float32)
    A = np.stack(
        [np.array([[-1.0, -1.0]]), np.array([[1.0, 1.0]])]
    ).astype(np.float32)
    b = np.ones((2, 1), np.float32)
    res = solve_batch_two_phase(jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), 100, 100)
    status = np.asarray(res.status)
    assert status[0] == st.PRIMAL_INFEASIBLE
    assert status[1] == st.OPTIMAL


def test_solve_batch_from_basis_bland_parity():
    """Batched engine from a given basis reproduces single-solver results."""
    from linprog_tpu import PrimalRevisedSimplexSolver

    p = PRIMAL_PROBLEMS[0]
    B = 4
    c = jnp.asarray(np.tile(p.c.astype(np.float32), (B, 1)))
    A = jnp.asarray(np.tile(p.A.astype(np.float32), (B, 1, 1)))
    b = jnp.asarray(np.tile(p.b.astype(np.float32), (B, 1)))
    basis = jnp.asarray(np.tile(p.starting_basis, (B, 1)).astype(np.int32))
    res = solve_batch_from_basis(c, A, b, basis, 100)
    single = PrimalRevisedSimplexSolver(
        p.c, p.A, p.b, p.starting_basis
    ).solve()
    assert (np.asarray(res.status) == st.OPTIMAL).all()
    for i in range(B):
        assert np.allclose(np.asarray(res.x)[i], single.x, atol=1e-5)
        assert np.array_equal(np.asarray(res.basis)[i], single.basis)


def test_sharded_solve_matches_unsharded():
    B, m, n = 16, 8, 12
    c, G, h = random_inequality_lps(B, m, n, seed=5)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    mesh = make_batch_mesh()
    assert mesh.devices.size == 8
    res_sh = sharded_two_phase_solve(mesh, cs, As, bs, 300, 300)
    res_1 = solve_batch_two_phase(cs, As, bs, 300, 300)
    assert np.allclose(np.asarray(res_sh.cost), np.asarray(res_1.cost), atol=1e-5)
    assert np.array_equal(np.asarray(res_sh.status), np.asarray(res_1.status))


def test_sharded_batch_must_divide_mesh():
    mesh = make_batch_mesh()
    c = jnp.zeros((6, 2))
    A = jnp.zeros((6, 1, 2))
    b = jnp.zeros((6, 1))
    with pytest.raises(ValueError):
        sharded_two_phase_solve(mesh, c, A, b)


def test_sharded_pdhg_matches_unsharded():
    """Sharded batched PDHG: same results as the unsharded call (lanes are
    independent; the mesh only changes placement)."""
    import numpy as np

    from linprog_tpu.parallel import (
        make_batch_mesh,
        sharded_pdhg_batch_canonical,
    )
    from linprog_tpu.pdhg import PDHGConfig, pdhg_solve_batch_canonical

    B, m, n = 16, 12, 16
    c, G, h = random_inequality_lps(B, m, n, seed=6)
    cfg = PDHGConfig(eps_rel=1e-5, dtype="float32")
    cj, Gj, hj = jnp.asarray(np.float32(c)), jnp.asarray(np.float32(G)), \
        jnp.asarray(np.float32(h))
    ref = pdhg_solve_batch_canonical(cj, Gj, hj, maxiters=50_000, cfg=cfg)
    mesh = make_batch_mesh()
    out = sharded_pdhg_batch_canonical(mesh, cj, Gj, hj, maxiters=50_000,
                                       cfg=cfg)
    assert np.array_equal(np.asarray(ref[2]), np.asarray(out[2]))  # status
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-5)  # costs
