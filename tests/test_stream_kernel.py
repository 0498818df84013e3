"""Streaming mega-kernel (HBM-resident A / VMEM-resident factors).

Parity of both variants (``resident``: one DMA of A per segment;
``stream``: per-iteration double-buffered column-block DMA) against the
XLA batched path and the vmapped per-lane engine, in TPU interpret mode
on CPU.  On hardware the same kernel covers m in (~384, ~1152], where the
whole-in-VMEM kernel exceeds Mosaic's scoped-VMEM limit (reference
capability at these sizes: plain NumPy revised simplex,
``/root/reference/linprog/primal_solvers.py:212-263``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """XLA's CPU backend segfaults compiling the blocked-factor stream
    kernel after ~280 accumulated suite compilations (reproducible at the
    same collection position, NOT memory -- 4.7 GB RSS on a 125 GB host;
    the same test passes in isolation and in any sub-suite).  Clearing
    JAX's executable/tracing caches before this module resets the
    compiler state and avoids the crash; later modules simply recompile.
    """
    import jax as _jax

    _jax.clear_caches()
    yield

from linprog_tpu import SolverConfig, engine
from linprog_tpu import status as st
from linprog_tpu.engine_batched import (
    _stream_variant,
    run_batched,
    run_batched_stream,
)
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch


def _setup(B=6, m=8, n=16, seed=5):
    c, G, h = random_inequality_lps(B, m, n, seed=seed)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    n_std = cs.shape[1]
    basis = jnp.broadcast_to(jnp.arange(n, n_std, dtype=jnp.int32), (B, m))
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(As, bs, basis)
    allowed = jnp.ones((n_std,), bool)
    return cs, As, bs, states, allowed


@pytest.mark.parametrize("variant,n_blk", [("resident", 0), ("stream", 8)])
@pytest.mark.parametrize("pricing", ["dantzig", "bland"])
def test_primal_parity_vs_xla(variant, n_blk, pricing):
    cs, As, bs, states, allowed = _setup()
    cfg = SolverConfig(pricing=pricing, refactor_every=16)
    ref = run_batched(cs, As, bs, states, allowed, 200,
                      cfg.replace(kernels="xla"))
    out = run_batched_stream(cs, As, bs, states, allowed, 200,
                             cfg.replace(kernels="pallas"),
                             variant=variant, n_blk=n_blk)
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    np.testing.assert_allclose(
        np.asarray(out.bfs), np.asarray(ref.bfs), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("variant,n_blk", [("resident", 0), ("stream", 2)])
def test_dual_parity_vs_vmapped_engine(variant, n_blk):
    from tests.problems import DUAL_PROBLEMS

    p = DUAL_PROBLEMS[0]
    B = 4
    scales = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    c = jnp.tile(jnp.asarray(p.c, jnp.float32), (B, 1))
    A = jnp.tile(jnp.asarray(p.A, jnp.float32), (B, 1, 1))
    b = jnp.asarray(scales[:, None] * p.b[None, :], jnp.float32)
    basis = jnp.tile(jnp.asarray(p.starting_basis, jnp.int32), (B, 1))
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(A, b, basis)
    allowed = jnp.ones((c.shape[1],), bool)
    cfg = SolverConfig(refactor_every=0)

    ref = jax.vmap(
        engine.run, in_axes=(0, 0, 0, 0, None, None, None, None)
    )(c, A, b, states, allowed, 100, cfg.replace(kernels="xla"), "dual")
    out = run_batched_stream(c, A, b, states, allowed, 100,
                             cfg.replace(kernels="pallas"), mode="dual",
                             variant=variant, n_blk=n_blk)
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    np.testing.assert_allclose(
        np.asarray(out.bfs), np.asarray(ref.bfs), atol=2e-4, rtol=2e-4
    )


def _setup_feasible(B=6, m=8, n=16, seed=7):
    """Like _setup but with h > 0, so the slack basis is primal-feasible
    and a raw phase-2 run from it has a well-defined unique optimum
    (the plain _setup instances have negative h entries: fine for
    pivot-path parity, meaningless for cross-rule cost comparison)."""
    c, G, h = random_inequality_lps(B, m, n, seed=seed)
    h = np.abs(h) + 0.1
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    n_std = cs.shape[1]
    basis = jnp.broadcast_to(jnp.arange(n, n_std, dtype=jnp.int32), (B, m))
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(As, bs, basis)
    allowed = jnp.ones((n_std,), bool)
    return cs, As, bs, states, allowed


@pytest.mark.parametrize("variant,n_blk", [("resident", 8), ("stream", 8)])
@pytest.mark.parametrize("pricing", ["dantzig", "bland"])
def test_partial_pricing_reaches_same_optimum(pricing, variant, n_blk):
    """Sectional pricing pivots differently but must land the same optima."""
    cs, As, bs, states, allowed = _setup_feasible(B=6, m=8, n=16, seed=7)
    cfg = SolverConfig(pricing=pricing, refactor_every=16)
    ref = run_batched(cs, As, bs, states, allowed, 400,
                      cfg.replace(kernels="xla"))
    out = run_batched_stream(
        cs, As, bs, states, allowed, 400,
        cfg.replace(kernels="pallas", partial_pricing=True),
        variant=variant, n_blk=n_blk,
    )
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    c_np = np.asarray(cs)
    for res in (ref, out):
        assert (np.asarray(res.status) == st.OPTIMAL).all()
    cost_ref = np.einsum(
        "bm,bm->b", np.take_along_axis(c_np, np.asarray(ref.basis), axis=1),
        np.asarray(ref.bfs),
    )
    cost_out = np.einsum(
        "bm,bm->b", np.take_along_axis(c_np, np.asarray(out.basis), axis=1),
        np.asarray(out.bfs),
    )
    np.testing.assert_allclose(cost_out, cost_ref, atol=1e-4, rtol=1e-4)


def test_partial_pricing_detects_unbounded():
    c = jnp.asarray([[-1.0, 0.0]], jnp.float32)
    A = jnp.asarray([[[1.0, -1.0]]], jnp.float32)
    b = jnp.asarray([[1.0]], jnp.float32)
    basis = jnp.asarray([[0]], jnp.int32)
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(A, b, basis)
    allowed = jnp.ones((2,), bool)
    out = run_batched_stream(
        c, A, b, states, allowed, 50,
        SolverConfig(refactor_every=0, partial_pricing=True,
                     pricing="dantzig"),
        variant="stream", n_blk=2,
    )
    assert int(np.asarray(out.status)[0]) == st.PRIMAL_UNBOUNDED
    assert int(np.asarray(out.basis)[0, 0]) == 0


def test_unbounded_lane_keeps_consistent_state():
    # one clearly unbounded lane in the batch: min -x, x - s = 1 (x free up)
    c = jnp.asarray([[-1.0, 0.0]], jnp.float32)
    A = jnp.asarray([[[1.0, -1.0]]], jnp.float32)
    b = jnp.asarray([[1.0]], jnp.float32)
    basis = jnp.asarray([[0]], jnp.int32)
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(A, b, basis)
    allowed = jnp.ones((2,), bool)
    out = run_batched_stream(c, A, b, states, allowed, 50,
                             SolverConfig(refactor_every=0),
                             variant="resident", n_blk=0)
    assert int(np.asarray(out.status)[0]) == st.PRIMAL_UNBOUNDED
    # basis must be untouched by the aborted pivot
    assert int(np.asarray(out.basis)[0, 0]) == 0


def test_blocked_eta_update_parity(monkeypatch):
    """The row-blocked in-place eta path (large-m VMEM shape) must be
    pivot-exact vs the single-shot update."""
    import linprog_tpu.ops.stream_kernel as sk

    cs, As, bs, states, allowed = _setup(B=4, m=12, n=20, seed=2)
    cfg = SolverConfig(pricing="dantzig", refactor_every=16)
    ref = run_batched_stream(cs, As, bs, states, allowed, 200,
                             cfg.replace(kernels="pallas"),
                             variant="stream", n_blk=4)
    monkeypatch.setattr(sk, "_ETA_BLOCK_ABOVE_M", 4)  # m=12 -> blocked (8+4)
    jax.clear_caches()  # the threshold is read at trace time
    out = run_batched_stream(cs, As, bs, states, allowed, 200,
                             cfg.replace(kernels="pallas"),
                             variant="stream", n_blk=4)
    jax.clear_caches()
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    np.testing.assert_allclose(
        np.asarray(out.bfs), np.asarray(ref.bfs), atol=1e-5, rtol=1e-5
    )


def test_stream_variant_dispatch():
    # small / mid shapes fit the resident variant under the raised
    # 100 MB vmem_limit (24 MB raw-operand budget after the measured 4x
    # Mosaic inflation)
    assert _stream_variant(64, 128) == ("resident", 0)
    assert _stream_variant(512, 1536)[0] == "resident"
    assert _stream_variant(1024, 3072)[0] == "resident"
    # m ~= 1400: A slab too big even single-buffered -> per-iteration
    # streaming in (m, n_blk) blocks
    v = _stream_variant(1400, 4224)
    assert v is not None and v[0] == "stream"
    # m = 2048 still fits streaming under the 48 MB manually-managed
    # scratch budget (validated on hardware, benchmarks/stream_m2048.py)
    v = _stream_variant(2048, 6144)
    assert v is not None and v[0] == "stream"
    # past the plain-stream factor ceiling (2 m^2 alone): the
    # blocked-factor mode takes over up to m ~= 4096
    assert _stream_variant(3072, 9216)[0] == "stream_blocked"
    assert _stream_variant(4096, 12288)[0] == "stream_blocked"
    # beyond even one m x m factor in VMEM: no pallas variant
    assert _stream_variant(6144, 18432) is None


def test_run_batched_dispatches_streaming(monkeypatch):
    """run_batched must route mid-size problems to the streaming kernel."""
    import linprog_tpu.engine_batched as eb

    called = {}

    def fake_stream(c, A, b, state, allowed, maxiters, cfg, mode="primal",
                    variant="resident", n_blk=0):
        called["variant"] = variant
        return state

    monkeypatch.setattr(eb, "run_batched_stream", fake_stream)
    monkeypatch.setattr(eb, "_mega_kernel_fits",
                        lambda m, n, with_at, **kw: False)
    cs, As, bs, states, allowed = _setup(B=2)
    run_batched(cs, As, bs, states, allowed, 10,
                SolverConfig(kernels="pallas"))
    assert called["variant"] == "resident"


@pytest.mark.parametrize("variant,n_blk", [("resident", 0), ("stream", 8)])
def test_stream_packed_select_same_answers(variant, n_blk):
    """Packed-key fused selection in the streaming kernel: tie-breaks may
    differ, but statuses, optimality, and costs must match unpacked."""
    cs, As, bs, states, allowed = _setup(seed=9)
    cfg = SolverConfig(
        pricing="dantzig", refactor_every=16, kernels="pallas"
    )
    ref = run_batched_stream(cs, As, bs, states, allowed, 200, cfg,
                             variant=variant, n_blk=n_blk)
    states2 = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(
        As, bs, ref.basis * 0 + states.basis
    )
    out = run_batched_stream(cs, As, bs, states2, allowed, 200,
                             cfg.replace(packed_select=True),
                             variant=variant, n_blk=n_blk)
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    cB_r = np.take_along_axis(np.asarray(cs), np.asarray(ref.basis), axis=1)
    cB_o = np.take_along_axis(np.asarray(cs), np.asarray(out.basis), axis=1)
    np.testing.assert_allclose(
        (cB_o * np.asarray(out.bfs)).sum(axis=1),
        (cB_r * np.asarray(ref.bfs)).sum(axis=1), rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize("pricing", ["dantzig", "bland"])
def test_blocked_factor_parity_vs_xla(pricing):
    """The blocked-factor mode (m > ~2048 on hardware; the factor is only
    ever touched in (RB, m) ref slices) must match the XLA path exactly."""
    cs, As, bs, states, allowed = _setup()
    cfg = SolverConfig(pricing=pricing, refactor_every=16)
    ref = run_batched(cs, As, bs, states, allowed, 200,
                      cfg.replace(kernels="xla"))
    states2 = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(
        As, bs, states.basis
    )
    out = run_batched_stream(cs, As, bs, states2, allowed, 200,
                             cfg.replace(kernels="pallas"),
                             variant="stream_blocked", n_blk=8)
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    np.testing.assert_allclose(
        np.asarray(out.bfs), np.asarray(ref.bfs), atol=2e-4, rtol=2e-4
    )


def test_blocked_factor_with_packed_select():
    """packed_select + blocked-factor mode together (the production
    combination for m in (2048, 4096] under the bench config)."""
    cs, As, bs, states, allowed = _setup(seed=13)
    cfg = SolverConfig(pricing="dantzig", refactor_every=16,
                       kernels="pallas")
    ref = run_batched_stream(cs, As, bs, states, allowed, 200, cfg,
                             variant="stream_blocked", n_blk=8)
    states2 = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(
        As, bs, states.basis
    )
    out = run_batched_stream(cs, As, bs, states2, allowed, 200,
                             cfg.replace(packed_select=True),
                             variant="stream_blocked", n_blk=8)
    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    cB_r = np.take_along_axis(np.asarray(cs), np.asarray(ref.basis), axis=1)
    cB_o = np.take_along_axis(np.asarray(cs), np.asarray(out.basis), axis=1)
    np.testing.assert_allclose(
        (cB_o * np.asarray(out.bfs)).sum(axis=1),
        (cB_r * np.asarray(ref.bfs)).sum(axis=1), rtol=2e-4, atol=2e-4,
    )
