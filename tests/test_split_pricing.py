"""Split-bf16 pricing (cfg.split_pricing): the mega-kernel's O(mn) pricing
matmul as three single-pass bf16 products on pre-split operands.

Products of bf16 halves are EXACT in the f32 accumulator; the only extra
error vs f32 is the dropped lo*lo term (~2^-18 relative), so pivot paths
on well-scaled instances match the HIGHEST path and final costs agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import SolverConfig, engine
from linprog_tpu import status as st
from linprog_tpu.engine_batched import run_batched_pallas
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch


def _setup(B=6, m=12, n=20, seed=5):
    c, G, h = random_inequality_lps(B, m, n, seed=seed)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    n_std = cs.shape[1]
    basis = jnp.broadcast_to(jnp.arange(n, n_std, dtype=jnp.int32), (B, m))
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(As, bs, basis)
    return cs, As, bs, states, jnp.ones((n_std,), bool), n_std


@pytest.mark.parametrize("pricing", ["dantzig", "bland"])
def test_split_pricing_matches_f32(pricing):
    cs, As, bs, states, allowed, n_std = _setup()
    outs = {}
    for sp in (False, True):
        cfg = SolverConfig(pricing=pricing, kernels="pallas",
                           refactor_every=16, split_pricing=sp)
        out = run_batched_pallas(cs, As, bs, states, allowed, 200, cfg)
        x = jax.vmap(engine.expand_bfs, in_axes=(0, None))(out, n_std)
        cost = np.einsum("bn,bn->b", np.asarray(x), np.asarray(cs))
        outs[sp] = (np.asarray(out.status), cost)
    assert (outs[True][0] == st.OPTIMAL).all()
    assert np.array_equal(outs[False][0], outs[True][0])
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=1e-4, atol=1e-4)


def test_split_pricing_guards():
    from linprog_tpu.ops.solve_kernel import solve_segment

    B, m, n = 1, 4, 8
    z3 = jnp.zeros((B, m, n), jnp.float32)
    zb = jnp.zeros((B, m, 2 * n), jnp.bfloat16)
    row = jnp.zeros((B, 1, n), jnp.float32)
    rm = jnp.zeros((B, 1, m), jnp.float32)
    im = jnp.zeros((B, 1, m), jnp.int32)
    s = jnp.zeros((B, 1, 1), jnp.int32)
    with pytest.raises(ValueError, match="split pricing requires"):
        solve_segment(
            z3, jnp.zeros((B, n, m), jnp.float32), zb, row, row,
            jnp.zeros((1, 1, 1), jnp.int32),
            jnp.zeros((B, m, m), jnp.float32), rm, rm, im, row, row, s, s,
            seg_len=4, pricing=1, opt_tol=1e-6, pivot_tol=1e-7,
            dual=True, split=True,
        )
