"""The whole-segment mega-kernel must match the vmapped engine exactly:
same pivots, same bases, same statuses, same iteration counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """Same workaround as tests/test_stream_kernel.py: XLA's CPU backend
    segfaults compiling Pallas interpret-mode kernels after ~280
    accumulated suite compilations (the preceding router/calibration
    tests grew their compile count in round 5 and moved the crash into
    this module).  Clearing JAX's caches resets the compiler state.
    """
    jax.clear_caches()
    yield


from linprog_tpu import SolverConfig, engine
from linprog_tpu import status as st
from linprog_tpu.engine_batched import run_batched_pallas
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch


def _setup(B=6, m=8, n=10, seed=0):
    c, G, h = random_inequality_lps(B, m, n, seed=seed)
    cs, As, bs = to_standard_form_batch(c, G, h)
    csj, Asj, bsj = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    ntot = cs.shape[1]
    c1 = jnp.concatenate(
        [jnp.zeros((B, ntot), jnp.float32), jnp.ones((B, m), jnp.float32)], axis=1
    )
    eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (B, m, m))
    A1 = jnp.concatenate([Asj, eye], axis=2)
    states = jax.vmap(engine.artificial_state, in_axes=(0, None))(bsj, ntot)
    allowed = jnp.ones((ntot + m,), bool)
    return c1, A1, bsj, states, allowed


@pytest.mark.parametrize("pricing", ["bland", "dantzig"])
@pytest.mark.parametrize("seed", [0, 4])
def test_mega_kernel_matches_vmapped_engine(pricing, seed):
    cfg = SolverConfig(pricing=pricing, kernels="pallas", refactor_every=0,
                       dtype="float32")
    c1, A1, bsj, states, allowed = _setup(seed=seed)

    # reference: vmapped per-lane engine to completion
    ref = jax.vmap(
        engine.run, in_axes=(0, 0, 0, 0, None, None, None, None)
    )(c1, A1, bsj, states, allowed, 100, cfg.replace(kernels="xla"), "primal")

    out = run_batched_pallas(c1, A1, bsj, states, allowed, 100, cfg)

    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.iters), np.asarray(ref.iters))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    np.testing.assert_allclose(
        np.asarray(out.bfs), np.asarray(ref.bfs), atol=2e-4, rtol=2e-4
    )


def test_mega_kernel_with_refactor_segments():
    cfg = SolverConfig(pricing="dantzig", kernels="pallas", refactor_every=3,
                       dtype="float32")
    c1, A1, bsj, states, allowed = _setup(seed=7)
    out = run_batched_pallas(c1, A1, bsj, states, allowed, 100, cfg)
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    # phase-1 objective reaches zero (feasible instances)
    n_struct = c1.shape[1] - bsj.shape[1]
    art = np.asarray(out.basis) >= n_struct
    art_mass = np.where(art, np.asarray(out.bfs), 0.0).sum(axis=1)
    assert (art_mass < 1e-4).all()


def test_mega_kernel_respects_maxiters():
    cfg = SolverConfig(pricing="dantzig", kernels="pallas", refactor_every=0)
    c1, A1, bsj, states, allowed = _setup(seed=1)
    out = run_batched_pallas(c1, A1, bsj, states, allowed, 2, cfg)
    assert (np.asarray(out.iters) <= 2).all()


def test_mega_kernel_two_phase_end_to_end():
    from linprog_tpu.batch import solve_batch_two_phase

    scipy_opt = pytest.importorskip("scipy.optimize")
    B, m, n = 8, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=9)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cfg = SolverConfig(pricing="dantzig", kernels="pallas", refactor_every=16)
    res = solve_batch_two_phase(
        jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs), 300, 300, cfg
    )
    assert (np.asarray(res.status) == st.OPTIMAL).all()
    for i in range(B):
        ref = scipy_opt.linprog(
            c[i], A_ub=G[i], b_ub=h[i], bounds=(0, None), method="highs"
        )
        assert ref.status == 0
        assert abs(float(res.cost[i]) - ref.fun) / max(1.0, abs(ref.fun)) < 5e-5


def test_devex_pricing_reaches_optima():
    """Devex pricing (mega-kernel only) must reach the same optima as
    dantzig, typically in no more iterations."""
    from linprog_tpu.batch import solve_batch_two_phase

    B, m, n = 8, 12, 16
    c, G, h = random_inequality_lps(B, m, n, seed=23)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    dz = solve_batch_two_phase(
        cs, As, bs, 300, 300,
        SolverConfig(pricing="dantzig", kernels="pallas", refactor_every=16),
    )
    dv = solve_batch_two_phase(
        cs, As, bs, 300, 300,
        SolverConfig(pricing="devex", kernels="pallas", refactor_every=16),
    )
    assert (np.asarray(dv.status) == st.OPTIMAL).all()
    np.testing.assert_allclose(
        np.asarray(dv.cost), np.asarray(dz.cost), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("unroll", [2, 3])
@pytest.mark.parametrize("stall_limit", [0, 4])
def test_unrolled_kernel_matches_unroll1(unroll, stall_limit):
    """Inner-loop unrolling must be bit-identical to unroll=1: every
    sub-iteration is run-gated, so terminated lanes write nothing."""
    cfg = SolverConfig(pricing="dantzig", kernels="pallas", refactor_every=0,
                       stall_limit=stall_limit)
    c1, A1, bsj, states, allowed = _setup(seed=3)
    ref = run_batched_pallas(c1, A1, bsj, states, allowed, 100, cfg)
    out = run_batched_pallas(c1, A1, bsj, states, allowed, 100,
                             cfg.replace(unroll=unroll))
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.iters), np.asarray(ref.iters))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    np.testing.assert_array_equal(np.asarray(out.bfs), np.asarray(ref.bfs))


def test_no_at_column_fetch_matches(monkeypatch):
    """The matmul column-fetch path (use_at=False, for large m) must match
    the resident-A^T path exactly."""
    import linprog_tpu.engine_batched as eb

    cfg = SolverConfig(pricing="dantzig", kernels="pallas", refactor_every=0)
    c1, A1, bsj, states, allowed = _setup(seed=11)
    ref = run_batched_pallas(c1, A1, bsj, states, allowed, 100, cfg)

    real_fits = eb._mega_kernel_fits
    monkeypatch.setattr(
        eb, "_mega_kernel_fits",
        lambda m, n, with_at, **kw: False if with_at else real_fits(
            m, n, with_at=False, **kw),
    )
    out = eb.run_batched_pallas(c1, A1, bsj, states, allowed, 100, cfg)
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    assert np.array_equal(np.asarray(out.iters), np.asarray(ref.iters))


@pytest.mark.parametrize("stall", [0, 24])
def test_packed_select_same_answers(stall):
    """Packed-key fused selection: pivot tie-breaks may differ from exact
    Dantzig, but statuses and optimal costs must match the unpacked kernel."""
    from linprog_tpu.batch import solve_batch_two_phase
    from linprog_tpu.generators import (
        random_inequality_lps,
        to_standard_form_batch,
    )

    B, m, n = 8, 12, 16
    c, G, h = random_inequality_lps(B, m, n, seed=41)
    cs, As, bs = to_standard_form_batch(c, G, h)
    base = SolverConfig(
        pricing="dantzig", kernels="pallas", refactor_every=8,
        stall_limit=stall,
    )
    ref = solve_batch_two_phase(cs, As, bs, 300, 300, base)
    out = solve_batch_two_phase(
        cs, As, bs, 300, 300, base.replace(packed_select=True)
    )
    assert np.array_equal(np.asarray(ref.status), np.asarray(out.status))
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    np.testing.assert_allclose(
        np.asarray(out.cost), np.asarray(ref.cost), rtol=2e-4, atol=2e-4
    )


def test_packed_select_with_devex():
    """devex pricing + packed_select: devex keeps its exact score argmax,
    the ratio test packs -- same statuses/costs as unpacked devex."""
    from linprog_tpu.batch import solve_batch_two_phase
    from linprog_tpu.generators import (
        random_inequality_lps,
        to_standard_form_batch,
    )

    c, G, h = random_inequality_lps(6, 10, 14, seed=47)
    cs, As, bs = to_standard_form_batch(c, G, h)
    base = SolverConfig(pricing="devex", kernels="pallas", refactor_every=8)
    ref = solve_batch_two_phase(cs, As, bs, 300, 300, base)
    out = solve_batch_two_phase(cs, As, bs, 300, 300,
                                base.replace(packed_select=True))
    assert np.array_equal(np.asarray(ref.status), np.asarray(out.status))
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                               rtol=2e-4, atol=2e-4)
