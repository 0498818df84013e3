"""Whole-segment bounded-variable simplex mega-kernel.

The bounded engine (:mod:`linprog_tpu.bounded`; reference
``special_solvers.py:94-343``) ran batched only through vmap'd XLA ops --
every pivot paid multiple HBM passes over ``A`` and ``inv_B``.  This kernel
is the bounded twin of :mod:`solve_kernel`: up to ``seg_len`` complete
bounded-variable iterations per lane entirely in VMEM -- bound-aware
pricing, the three-way ratio test (basic drops to lb / basic hits ub /
entering variable traverses to its opposite bound), bound flips without a
basis change, the masked rank-1 eta update, and all bookkeeping
(``var_state``, basis cost/bound rows) -- with the same layout rules
(row-oriented vectors, transposed factor, HIGHEST-precision matmuls,
scalars in SMEM, input/output aliasing; see solve_kernel's docstring).

Extra state vs the primal kernel: ``vstate [1, n]`` (f32 codes 0=AT_LB,
1=AT_UB, 2=BASIC) and the basis bound rows ``lbB/ubB [1, m]`` maintained
incrementally so the ratio test never gathers from ``lb``/``ub``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import status as st

_HIGHEST = jax.lax.Precision.HIGHEST


def _interpret_default():
    if jax.default_backend() in ("tpu", "axon"):
        return False
    return pltpu.InterpretParams()


def _dotg(a, b, a_dim, b_dim):
    return lax.dot_general(
        a, b, (((a_dim,), (b_dim,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _bounded_kernel(seg_len: int, opt_tol: float, pivot_tol: float,
                    use_at: bool, unroll: int, packed: bool,
                    # inputs
                    A_ref, AT_ref, c_ref, lb_ref, ub_ref, maxiters_ref,
                    iters_in_ref, status_in_ref,
                    invBT_in_ref, bfs_in_ref, cB_in_ref, basis_in_ref,
                    vstate_in_ref, lbB_in_ref, ubB_in_ref,
                    # outputs (aliased)
                    invBT_ref, bfs_ref, cB_ref, basis_ref, vstate_ref,
                    lbB_ref, ubB_ref, iters_out_ref, status_out_ref):
    m, n = A_ref.shape[1], A_ref.shape[2]
    lane_n = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_m = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    subl_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    inf = jnp.float32(jnp.inf)

    # packed-key fused selection (see solve_kernel.pack_min_keys)
    from .solve_kernel import INTMAX as _INTMAX
    from .solve_kernel import pack_min_keys as _pack_min
    bits_n = max(1, (n - 1).bit_length())
    bits_m = max(1, (m - 1).bit_length())
    lo_n = jnp.int32((1 << bits_n) - 1)
    lo_m = jnp.int32((1 << bits_m) - 1)

    invBT_ref[0] = invBT_in_ref[0]
    bfs_ref[0] = bfs_in_ref[0]
    cB_ref[0] = cB_in_ref[0]
    basis_ref[0] = basis_in_ref[0]
    vstate_ref[0] = vstate_in_ref[0]
    lbB_ref[0] = lbB_in_ref[0]
    ubB_ref[0] = ubB_in_ref[0]

    maxiters = maxiters_ref[0, 0, 0]

    def cond(carry):
        seg, iters, status = carry
        return (status == st.RUNNING) & (seg < seg_len) & (iters < maxiters)

    def body(carry):
        seg, iters, status = carry
        # Under unrolling the loop condition is only checked every `unroll`
        # iterations; each sub-iteration re-derives "may I act" and gates
        # every state transition on it (same scheme as solve_kernel).
        if unroll > 1:
            run = (status == st.RUNNING) & (seg < seg_len) & (iters < maxiters)
        else:
            run = jnp.ones((), jnp.bool_)  # guaranteed by the loop cond
        A = A_ref[0]
        invBT = invBT_ref[0]
        bfs = bfs_ref[0]
        cB = cB_ref[0]
        basis = basis_ref[0]
        vstate = vstate_ref[0]  # (1, n) f32: 0=AT_LB, 1=AT_UB, 2=BASIC
        lbB = lbB_ref[0]
        ubB = ubB_ref[0]
        c = c_ref[0]
        lb = lb_ref[0]
        ub = ub_ref[0]

        # ---- bound-aware pricing (reference special_solvers.py:177-199):
        # z - c for AT_LB vars, c - z for AT_UB; basic entries ineligible
        y = _dotg(cB, invBT, 1, 1)  # (1, m)
        zc = _dotg(y, A, 1, 0) - c  # (1, n)
        rc = jnp.where(vstate == 1.0, -zc, zc)
        rc = jnp.where(vstate == 2.0, -inf, rc)
        if packed:
            # argmax(rc) == packed argmin(-rc) over candidates rc > opt_tol
            # (candidate -rc values are negative -> complement mapping)
            kr = jnp.min(_pack_min(-rc, rc > opt_tol, lane_n, bits_n, True))
            eligible = kr != _INTMAX
            enter = jnp.where(eligible, jnp.bitwise_and(kr, lo_n), 0)
        else:
            best = jnp.max(rc)
            eligible = best > opt_tol
            enter = jnp.min(jnp.where(rc == best, lane_n, n))
            enter = jnp.where(eligible, enter, 0)
        at_enter = lane_n == enter

        # masked one-nonzero extracts, PACKED: one (4, n) lane reduction
        # instead of four separate full-row reductions (bit-exact: each row
        # has a single surviving element; the +/-inf bound entries survive
        # the per-row sums unchanged); see solve_kernel
        rows_n = jnp.concatenate(
            [jnp.where(at_enter, vstate, 0.0),
             jnp.where(at_enter, lb, 0.0),
             jnp.where(at_enter, ub, 0.0),
             jnp.where(at_enter, c, 0.0)], axis=0,
        )  # (4, n)
        sums_n = jnp.sum(rows_n, axis=1, keepdims=True)  # (4, 1)
        vs_enter = sums_n[0, 0]
        lb_e = sums_n[1, 0]
        ub_e = sums_n[2, 0]  # inf-safe: selected entry passes through
        c_e = sums_n[3, 0]
        sigma = jnp.where(vs_enter == 0.0, 1.0, -1.0)  # +1 from lb, -1 from ub

        # ---- direction ----------------------------------------------------
        if use_at:
            a_row = AT_ref[0, pl.ds(enter, 1), :]  # (1, m)
        else:
            onehot_n = jnp.where(at_enter, 1.0, 0.0)
            a_row = _dotg(onehot_n, A, 1, 1)
        d = _dotg(a_row, invBT, 1, 0)  # (1, m)
        sd = sigma * d

        # ---- three-way ratio test (reference :239-331) --------------------
        # gamma1: basic drops to its lower bound; gamma2: basic hits upper;
        # gamma3: entering variable traverses to its opposite bound
        room_lo = jnp.maximum(bfs - lbB, 0.0)  # clamp refactor noise
        room_hi = jnp.maximum(ubB - bfs, 0.0)
        pos = sd > pivot_tol
        neg = -sd > pivot_tol
        g1v = jnp.where(pos, room_lo / jnp.where(pos, sd, 1.0), inf)
        g2v = jnp.where(neg, room_hi / jnp.where(neg, -sd, 1.0), inf)
        gamma3 = ub_e - lb_e
        if packed:
            # both ratio argmins in ONE (2, m) packed reduction; the step
            # length delta is then re-extracted EXACTLY at the chosen row
            # (delta feeds the bfs update, so its value must not carry the
            # packed keys' truncated mantissa)
            kk = jnp.concatenate(
                [_pack_min(g1v, pos, lane_m, bits_m, False),
                 _pack_min(g2v, neg, lane_m, bits_m, False)], axis=0,
            )  # (2, m)
            kmin = jnp.min(kk, axis=1, keepdims=True)  # (2, 1)
            k1m, k2m = kmin[0, 0], kmin[1, 0]
            leave_to_lb = k1m < k2m
            ksel = jnp.minimum(k1m, k2m)
            leave_pre = jnp.bitwise_and(ksel, lo_m)
            delta = jnp.sum(jnp.where(
                lane_m == leave_pre,
                jnp.where(leave_to_lb, g1v, g2v), 0.0,
            ))
            delta = jnp.where(ksel != _INTMAX, delta, inf)
        else:
            g1 = jnp.min(g1v)
            g2 = jnp.min(g2v)
            delta = jnp.minimum(g1, g2)
            leave_to_lb = g1 < g2

        unbounded = eligible & jnp.isinf(delta) & jnp.isinf(gamma3)
        traverse = gamma3 <= delta
        flip = eligible & ~unbounded & traverse & run
        piv = eligible & ~unbounded & ~traverse & run

        if packed:
            leave = jnp.where(piv, leave_pre, 0)
        else:
            leave1 = jnp.min(jnp.where(g1v == g1, lane_m, m))
            leave2 = jnp.min(jnp.where(g2v == g2, lane_m, m))
            leave = jnp.where(leave_to_lb, leave1, leave2)
            leave = jnp.where(piv, leave, 0)
        at_leave = lane_m == leave

        # ---- incremental bfs: every basic moves by -step * sd; a pivot
        # then seats the entering variable's value in the leaving slot
        step_len = jnp.where(flip, gamma3, jnp.where(piv, delta, 0.0))
        bfs_new = bfs - step_len * sd
        enter_from = jnp.where(sigma > 0.0, lb_e, ub_e)
        enter_val = enter_from + sigma * delta
        bfs_new = jnp.where(piv & at_leave, enter_val, bfs_new)
        bfs_ref[0] = bfs_new

        # ---- masked rank-1 eta update of inv_B^T ---------------------------
        rows_m = jnp.concatenate(
            [jnp.where(at_leave, d, 0.0),
             jnp.where(at_leave, basis.astype(jnp.float32), 0.0)], axis=0,
        )  # (2, m)
        sums_m = jnp.sum(rows_m, axis=1, keepdims=True)  # (2, 1)
        d_l = sums_m[0, 0]
        leaving_col = sums_m[1, 0].astype(jnp.int32)  # exact: indices < 2^24
        safe = jnp.where(d_l == 0, jnp.ones_like(d_l), d_l)
        u = -d / safe
        u = jnp.where(at_leave, 1.0 / safe - 1.0, u)
        u = jnp.where(piv, u, jnp.zeros_like(u))
        onehot_l = jnp.where(subl_m == leave, 1.0, 0.0)
        col_l = _dotg(invBT, onehot_l, 1, 0)
        invBT_ref[0] = invBT + col_l * u

        # ---- bookkeeping ---------------------------------------------------
        basis_ref[0] = jnp.where(
            at_leave & piv, enter, basis
        ).astype(jnp.int32)
        cB_ref[0] = jnp.where(at_leave & piv, c_e, cB)
        lbB_ref[0] = jnp.where(at_leave & piv, lb_e, lbB)
        ubB_ref[0] = jnp.where(at_leave & piv, ub_e, ubB)

        at_leaving_col = lane_n == leaving_col
        vs_flip = jnp.where(at_enter & flip, 1.0 - vstate, vstate)
        vs_piv = jnp.where(at_enter, 2.0, vstate)
        vs_piv = jnp.where(
            at_leaving_col, jnp.where(leave_to_lb, 0.0, 1.0), vs_piv
        )
        vstate_ref[0] = jnp.where(piv, vs_piv, vs_flip)

        stop_status = jnp.where(
            jnp.logical_not(eligible),
            st.OPTIMAL,
            jnp.where(unbounded, st.PRIMAL_UNBOUNDED, st.RUNNING),
        )
        if unroll > 1:
            status_new = jnp.where(run, stop_status, status).astype(jnp.int32)
            iters_new = iters + run.astype(jnp.int32)
        else:
            status_new = stop_status.astype(jnp.int32)
            iters_new = iters + 1
        return seg + 1, iters_new, status_new

    seg0 = jnp.zeros((), jnp.int32)
    iters0 = iters_in_ref[0, 0, 0]
    status0 = status_in_ref[0, 0, 0]
    if unroll > 1:
        # `unroll` gated iterations per while trip: the loop condition and
        # carry shuffle are paid 1/unroll times per pivot
        def grouped(carry):
            for _ in range(unroll):
                carry = body(carry)
            return carry
        loop_body = grouped
    else:
        loop_body = body
    out = lax.while_loop(cond, loop_body, (seg0, iters0, status0))
    iters_out_ref[0, 0, 0] = out[1]
    status_out_ref[0, 0, 0] = out[2]


@functools.partial(
    jax.jit,
    static_argnames=("seg_len", "opt_tol", "pivot_tol", "use_at", "unroll",
                     "packed", "interpret"),
    donate_argnums=(6, 7, 8, 9, 10, 11, 12),
)
def solve_bounded_segment(A, AT, c_row, lb_row, ub_row, maxiters, invBT,
                          bfs, cB, basis, vstate, lbB, ubB, iters, status,
                          *, seg_len: int, opt_tol: float, pivot_tol: float,
                          use_at: bool = True, unroll: int = 1,
                          packed: bool = False, interpret=None):
    """Up to ``seg_len`` bounded-variable iterations per lane in VMEM.

    Shapes: ``A[B,m,n]``, ``AT[B,n,m]`` (or a ``[B,1,128]`` dummy with
    ``use_at=False``), ``c_row/lb_row/ub_row/vstate[B,1,n]``,
    ``maxiters[1,1,1]``, ``invBT[B,m,m]``, ``bfs/cB/lbB/ubB[B,1,m]``,
    ``basis[B,1,m]`` i32, ``iters/status[B,1,1]`` i32.  ``vstate`` uses
    f32 codes 0=AT_LB, 1=AT_UB, 2=BASIC.

    Returns ``(invBT, bfs, cB, basis, vstate, lbB, ubB, iters, status)``.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, m, n = A.shape
    kernel = functools.partial(
        _bounded_kernel, seg_len, opt_tol, pivot_tol, use_at,
        max(1, unroll), packed,
    )

    def lane(i):
        return (i, 0, 0)

    def shared(i):
        return (0, 0, 0)

    vmem = pltpu.VMEM
    smem = pltpu.SMEM
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m, n), lane, memory_space=vmem),  # A
            (pl.BlockSpec((1, n, m), lane, memory_space=vmem) if use_at
             else pl.BlockSpec((1, 1, AT.shape[2]), lane,
                               memory_space=vmem)),  # AT
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # c
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # lb
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # ub
            pl.BlockSpec((1, 1, 1), shared, memory_space=smem),  # maxiters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # iters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # status
            pl.BlockSpec((1, m, m), lane, memory_space=vmem),  # invBT
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # bfs
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # cB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # basis
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # vstate
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # lbB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # ubB
        ],
        out_specs=(
            pl.BlockSpec((1, m, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), invBT.dtype),
            jax.ShapeDtypeStruct((B, 1, m), bfs.dtype),
            jax.ShapeDtypeStruct((B, 1, m), cB.dtype),
            jax.ShapeDtypeStruct((B, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, n), vstate.dtype),
            jax.ShapeDtypeStruct((B, 1, m), lbB.dtype),
            jax.ShapeDtypeStruct((B, 1, m), ubB.dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3, 12: 4, 13: 5,
                              14: 6},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(A, AT, c_row, lb_row, ub_row, maxiters, iters, status, invBT, bfs,
      cB, basis, vstate, lbB, ubB)
    return outs
