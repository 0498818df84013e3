"""Whole-segment simplex mega-kernel: the entire iteration loop in VMEM.

The step-level kernels still pay the fundamental tax of one HBM pass over
``A`` (and three over ``inv_B``) per pivot.  For m <= ~512 a lane's whole
working set fits in VMEM (A ~0.8MB + inv_B^T ~0.26MB + vectors), so this
kernel runs up to ``seg_len`` *complete simplex iterations per lane* --
pricing, entering selection, ratio test, rank-1 eta update, basis/cost/
penalty bookkeeping, status transitions -- without touching HBM at all.
HBM traffic drops from O(iters * (A + 3 inv_B)) to O(segments * (A + inv_B));
with seg_len = 64..128 that is a ~100x reduction, leaving the VPU/MXU as the
limit.  Periodic refactorization happens between segments in XLA
(``jnp.linalg.inv`` has no Mosaic lowering, and it bounds eta drift anyway).

Performance-critical layout rules learned on v5e hardware:

* EVERY vector lives as a row ``(1, k)``: cross-LANE reductions (min/sum/
  argmin-via-iota) are fast VPU ops, while the same reductions on column
  vectors ``(k, 1)`` serialize across sublanes and dominated the first
  version of this kernel (~5x slowdown).
* no transposes per iteration: the factor is stored as ``inv_B^T`` and all
  matmuls use ``dot_general`` with transposed contracting dims, which the
  MXU consumes natively --
  pricing ``y = c_B inv_B``             -> contract cB.1 x invBT.1,
  column fetch ``a = A[:, enter]``      -> contract onehot.1 x A.1,
  direction ``d = inv_B a``             -> contract a.1 x invBT.0,
  eta column ``invB^T e_leave``         -> (m,1) onehot matmul;
* dynamic element reads (``d[leave]``, ``c[enter]``...) are masked lane
  reductions over iota -- Mosaic has no scalar gathers from VMEM values;
* matmuls force ``Precision.HIGHEST``: the MXU's default bf16 passes make
  reduced costs inaccurate enough to flip pivot choices and stop early at
  wrong vertices (observed, not hypothetical);
* per-lane scalars (iters, status) ride in SMEM.

State refs are input/output-aliased, so a segment updates solver state
in place in HBM.
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

# packed-key selection sentinel (see pack_min_keys); a PYTHON int -- a
# module-level jnp scalar would be a captured constant pallas rejects
INTMAX = 0x7FFFFFFF


def pack_min_keys(vals, mask, idx, bits: int, negate: bool):
    """Packed i32 keys whose min fuses (value-min, argmin, any-eligible).

    The index rides in the low ``bits`` bits of the monotonically
    int-mapped float value: ``negate=False`` for NONnegative ``vals``
    (IEEE bit patterns of nonnegative floats are order-preserving as
    ints), ``negate=True`` for negative ``vals`` (patterns are monotone
    DEcreasing, so the bitwise complement restores the order).  Masked-out
    entries get INT32_MAX, so ``min != INTMAX`` doubles as the
    any-candidate test.  Tie-breaking granularity is 2^-(23-bits) relative
    (ties resolve to the lowest index); the float values themselves are
    not perturbed.
    """
    u = lax.bitcast_convert_type(vals, jnp.int32)
    if negate:
        u = jnp.bitwise_not(u)
    key = jnp.bitwise_or(jnp.bitwise_and(u, jnp.int32(-(1 << bits))), idx)
    return jnp.where(mask, key, jnp.int32(INTMAX))


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _dotg(a, b, a_dim, b_dim):
    """2D dot_general contracting ``a_dim`` of a with ``b_dim`` of b."""
    return lax.dot_general(
        a, b, (((a_dim,), (b_dim,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _solve_segment_kernel(seg_len: int, pricing: int, opt_tol: float,
                          pivot_tol: float, dual: bool, feas_tol: float,
                          use_at: bool, stall_limit: int, ablate: int,
                          split: bool, unroll: int, packed: bool,
                          # inputs
                          A_ref, AT_ref, Ahl_ref, c_ref, apen_ref,
                          maxiters_ref, iters_in_ref, status_in_ref,
                          invBT_in_ref, bfs_in_ref, cB_in_ref, basis_in_ref,
                          pen_in_ref, gamma_in_ref,
                          # outputs (first six aliased to the last six inputs)
                          invBT_ref, bfs_ref, cB_ref, basis_ref, pen_ref,
                          gamma_ref, iters_out_ref, status_out_ref):
    # pricing: 0 = bland, 1 = dantzig, 2 = devex (reference-weight)
    dantzig = pricing >= 1
    if split:  # A_ref is a dummy; shapes come from the split copy [Ah | Al]
        m, n = Ahl_ref.shape[1], Ahl_ref.shape[2] // 2
    else:
        m, n = A_ref.shape[1], A_ref.shape[2]
    lane_n = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_m = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    subl_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    # packed-key selection (see pack_min_keys): fuse value min + argmin +
    # eligibility into ONE i32 lane reduction.  The reduced costs, the
    # optimality test, and the ratio values stay exact, so termination is
    # unaffected (the decisive difference from the split-pricing negative
    # result, where the test itself was noisy); only tie-breaking within
    # ~2^-(23-bits) relative can differ.  Any eligible column is a valid
    # Dantzig pick.
    _INTMAX = INTMAX
    _pack_min = pack_min_keys
    bits_n = max(1, (n - 1).bit_length())
    bits_m = max(1, (m - 1).bit_length())

    # initialize aliased state (self-copy under real aliasing; required for
    # interpreter mode where outputs start uninitialized)
    invBT_ref[0] = invBT_in_ref[0]
    bfs_ref[0] = bfs_in_ref[0]
    cB_ref[0] = cB_in_ref[0]
    basis_ref[0] = basis_in_ref[0]
    pen_ref[0] = pen_in_ref[0]
    gamma_ref[0] = gamma_in_ref[0]

    maxiters = maxiters_ref[0, 0, 0]

    # stall escalation active only for the fast rules (bland is cycle-free)
    track_stall = stall_limit > 0 and pricing >= 1

    def cond(carry):
        seg, iters, status = carry[0], carry[1], carry[2]
        return (status == st.RUNNING) & (seg < seg_len) & (iters < maxiters)

    def _split_price(y):
        """bf16x3 pricing: ONE single-pass bf16 matmul replaces the 6-pass
        HIGHEST f32 product.

        ``y`` is split into exact bf16 halves packed as rows 0/1 of a
        16-sublane tile (Mosaic needs a full bf16 lhs tile, not a 1-row
        vector); the rhs is the pre-split ``[Ah | Al]`` block, so one
        (16, m) @ (m, 2n) product yields yh*Ah, yh*Al (row 0) and yl*Ah
        (row 1).  Products of bf16 halves are exact in the f32
        accumulator; only the ~2^-18-relative lo*lo term is dropped.
        """
        yh = y.astype(jnp.bfloat16)
        yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
        # sublane concat (a where-over-iota packing trips a Mosaic
        # bf16/i1 relayout bug)
        lhs = jnp.concatenate(
            [yh, yl, jnp.zeros((14, m), jnp.bfloat16)], axis=0
        )
        out = lax.dot_general(
            lhs, Ahl_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # explicitly DEFAULT: the package-level
            # jax_default_matmul_precision=highest would force an fp32
            # contract, which Mosaic rejects for bf16 operands ("Bad lhs
            # type"); a native bf16 pass with f32 accumulation is exactly
            # what this path wants
            precision=jax.lax.Precision.DEFAULT,
        )  # (16, 2n) f32
        return out[0:1, :n] + out[0:1, n:] + out[1:2, :n]

    def one_iter(carry):
        seg, iters, status, z, dz_prev, stall, bland = carry
        # Under unrolling the loop condition is only checked every `unroll`
        # iterations, so each sub-iteration re-derives "may I act" and
        # gates every state transition on it; a lane that terminates
        # mid-group recomputes an identical stop state and writes nothing.
        if unroll > 1:
            run = (status == st.RUNNING) & (seg < seg_len) & (iters < maxiters)
        else:
            run = jnp.ones((), jnp.bool_)  # guaranteed by the loop cond
        A = None if split else A_ref[0]  # (m, n)
        invBT = invBT_ref[0]  # (m, m) = inv_B^T
        bfs = bfs_ref[0]  # (1, m)
        cB = cB_ref[0]  # (1, m)
        basis = basis_ref[0]  # (1, m) i32
        pen = pen_ref[0]  # (1, n)

        # ---- stalled-lane detection: no objective progress over k pivots
        # under dantzig/devex -> flip to Bland (cycle-free) until progress
        # resumes.  Matches SURVEY section-5 failure-detection plan; the
        # reference's default rule is cycle-safe Bland
        # (/root/reference/linprog/primal_solvers.py:135-138).
        # The per-pivot objective change ``dz`` is carried exactly
        # (dz = theta * r_enter, zero on degenerate/cycling pivots), so no
        # O(m) objective reduction is paid per iteration; ``z`` accumulates
        # the changes and is only used as the relative-progress scale.
        if track_stall:
            progressed = jnp.abs(dz_prev) > 1e-6 * (jnp.abs(z) + 1.0)
            stall_new = jnp.where(progressed, 0, stall + 1)
            bland_new = jnp.where(
                progressed, 0, jnp.where(stall_new >= stall_limit, 1, bland)
            )
            if unroll > 1:
                stall = jnp.where(run, stall_new, stall)
                bland = jnp.where(run, bland_new, bland)
            else:
                stall, bland = stall_new, bland_new
            use_bland = bland != 0
        else:
            use_bland = jnp.zeros((), jnp.bool_)

        if dual:
            # ---- dual iteration: leaving row first, then entering column --
            neg = bfs < -feas_tol  # (1, m) infeasible basics
            if dantzig and packed:
                # fused most-infeasible-row selection (see _pack_min)
                keys = _pack_min(bfs, neg, lane_m, bits_m, negate=True)
                lo_m = jnp.int32((1 << bits_m) - 1)
                if track_stall:
                    sel = jnp.concatenate(
                        [keys, jnp.where(neg, lane_m, m)], axis=0
                    )  # (2, m)
                    sel_min = jnp.min(sel, axis=1, keepdims=True)
                    viable = sel_min[0, 0] != _INTMAX
                    leave = jnp.where(
                        use_bland, sel_min[1, 0],
                        jnp.bitwise_and(sel_min[0, 0], lo_m),
                    )
                else:
                    k0 = jnp.min(keys)
                    viable = k0 != _INTMAX
                    leave = jnp.bitwise_and(k0, lo_m)
            elif dantzig:  # most-infeasible row (dual Dantzig)
                worst = jnp.min(bfs)
                viable = worst < -feas_tol
                if track_stall:
                    # fused: Dantzig argmin and the Bland (first infeasible)
                    # fallback in ONE packed (2, m) reduction instead of two
                    # full-row passes (the stalled-lane rule is the default)
                    sel = jnp.concatenate(
                        [jnp.where(bfs == worst, lane_m, m),
                         jnp.where(neg, lane_m, m)], axis=0,
                    )  # (2, m)
                    sel_min = jnp.min(sel, axis=1, keepdims=True)  # (2, 1)
                    leave = jnp.where(use_bland, sel_min[1, 0], sel_min[0, 0])
                else:
                    leave = jnp.min(jnp.where(bfs == worst, lane_m, m))
            else:  # bland: first infeasible row (reference rule)
                leave = jnp.min(jnp.where(neg, lane_m, m))
                viable = leave < m
            leave = jnp.where(viable, leave, 0)
            onehot_l0 = jnp.where(subl_m == leave, 1.0, 0.0)  # (m, 1)
            w = _dotg(invBT, onehot_l0, 1, 0)  # (m,1) == inv_B[leave, :]^T
            urow = _dotg(w, A, 0, 0)  # (1, n) dual direction row
            y = _dotg(cB, invBT, 1, 1)
            r = c_ref[0] - _dotg(y, A, 1, 0)  # raw reduced costs
            cand = (urow < -pivot_tol) & (pen == 0.0)
            theta_d = jnp.where(
                cand, -r / jnp.where(cand, urow, -jnp.ones_like(urow)), jnp.inf
            )
            if packed:
                # fused dual ratio argmin; clamp float-noise-negative
                # ratios to 0 so the nonnegative-bit-pattern packing holds
                dkeys = _pack_min(
                    jnp.maximum(theta_d, 0.0), cand, lane_n, bits_n,
                    negate=False,
                )
                drow = jnp.min(dkeys, axis=1, keepdims=True)  # (1, 1)
                d0 = drow[0, 0]
                any_cand = d0 != _INTMAX
                enter = jnp.bitwise_and(d0, jnp.int32((1 << bits_n) - 1))
                enter = jnp.where(any_cand, enter, 0)
                # Mosaic only bitcasts VECTORS; unpack via the (1,1) row
                best_d = lax.bitcast_convert_type(
                    jnp.bitwise_and(drow, jnp.int32(-(1 << bits_n))),
                    jnp.float32,
                )[0, 0]
                best_d = jnp.where(any_cand, best_d, jnp.inf)
            else:
                best_d = jnp.min(theta_d)
                any_cand = best_d < jnp.inf
                enter = jnp.min(
                    jnp.where(cand & (theta_d == best_d), lane_n, n)
                )
                enter = jnp.where(any_cand, enter, 0)

            do_pivot = viable & any_cand & run
            stop_status = jnp.where(
                jnp.logical_not(viable),
                st.OPTIMAL,
                jnp.where(viable & jnp.logical_not(any_cand),
                          st.DUAL_UNBOUNDED, st.RUNNING),
            )
            if use_at:
                a_row = AT_ref[0, pl.ds(enter, 1), :]
            else:
                onehot_n = jnp.where(lane_n == enter, 1.0, 0.0)
                a_row = _dotg(onehot_n, A, 1, 1)  # (1, m) == A[:, enter]^T
            d = _dotg(a_row, invBT, 1, 0)  # (1, m) == (inv_B a)^T
        else:
            # ---- pricing: y = c_B inv_B; r = c - y A (+ mask penalty) ----
            y = _dotg(cB, invBT, 1, 1)  # (1, m)
            if ablate == 1:  # PROFILING ONLY: drop the O(mn) pricing matmul
                r = c_ref[0] - jnp.sum(y) + pen
            elif split:
                r = c_ref[0] - _split_price(y) + pen  # (1, n)
            else:
                r = c_ref[0] - _dotg(y, A, 1, 0) + pen  # (1, n)

            if ablate == 4:  # PROFILING ONLY: skip entering-selection reductions
                neg = r < -opt_tol
                enter = lax.rem(seg, jnp.int32(n))
                eligible = jnp.ones((), jnp.bool_)
            elif packed and pricing == 1:
                # fused dantzig selection: value-min + argmin + eligibility
                # in ONE i32 reduction over index-packed keys (low ~2^-13
                # relative tie-break granularity; r itself stays exact)
                neg = r < -opt_tol
                keys = _pack_min(r, neg, lane_n, bits_n, negate=True)
                lo_n = jnp.int32((1 << bits_n) - 1)
                if track_stall:
                    sel = jnp.concatenate(
                        [keys, jnp.where(neg, lane_n, n)], axis=0
                    )  # (2, n)
                    sel_min = jnp.min(sel, axis=1, keepdims=True)  # (2, 1)
                    eligible = sel_min[0, 0] != _INTMAX
                    enter = jnp.where(
                        use_bland, sel_min[1, 0],
                        jnp.bitwise_and(sel_min[0, 0], lo_n),
                    )
                else:
                    k0 = jnp.min(keys)
                    eligible = k0 != _INTMAX
                    enter = jnp.bitwise_and(k0, lo_n)
            else:
                neg = r < -opt_tol
                if pricing == 2:  # devex: maximize r^2 / gamma over eligible
                    gamma = gamma_ref[0]
                    score = jnp.where(neg, (r * r) / gamma, -jnp.inf)
                    best_s = jnp.max(score)
                    eligible = best_s > -jnp.inf
                    hot = jnp.where(score == best_s, lane_n, n)
                elif dantzig:
                    best = jnp.min(r)
                    eligible = best < -opt_tol
                    hot = jnp.where(r == best, lane_n, n)
                else:
                    hot = jnp.where(neg, lane_n, n)
                if track_stall:
                    # fused: the rule's argmin and the Bland (first
                    # eligible) stall fallback in ONE packed (2, n)
                    # reduction instead of two full-row passes
                    sel = jnp.concatenate(
                        [hot, jnp.where(neg, lane_n, n)], axis=0
                    )  # (2, n)
                    sel_min = jnp.min(sel, axis=1, keepdims=True)  # (2, 1)
                    enter = jnp.where(use_bland, sel_min[1, 0], sel_min[0, 0])
                else:
                    enter = jnp.min(hot)
                if not dantzig and pricing != 2:
                    eligible = enter < n
            enter = jnp.where(eligible, enter, 0)

            # ---- direction + primal ratio test ---------------------------
            if use_at:
                a_row = AT_ref[0, pl.ds(enter, 1), :]  # (1, m) == A[:, enter]^T
            else:
                # no A^T resident: fetch the column as a one-hot matmul
                # (cheaper in VMEM, one extra O(mn) MXU op per pivot; used
                # for large m where A + A^T no longer fit)
                onehot_n = jnp.where(lane_n == enter, 1.0, 0.0)
                a_row = _dotg(onehot_n, A, 1, 1)
            if ablate == 2:  # PROFILING ONLY: drop the direction matmul
                d = a_row
            else:
                d = _dotg(a_row, invBT, 1, 0)  # (1, m) == (inv_B a)^T
            if ablate == 5:  # PROFILING ONLY: skip ratio-test reductions
                any_pos = jnp.ones((), jnp.bool_)
                best_t = jnp.zeros((), jnp.float32)
                leave = lax.rem(seg, jnp.int32(m))
            elif packed:
                pos = d > pivot_tol
                bfs_nn = jnp.maximum(bfs, 0.0)
                theta = jnp.where(
                    pos, bfs_nn / jnp.where(pos, d, jnp.ones_like(d)), jnp.inf
                )
                # fused min-ratio + arg + any_pos in one i32 reduction
                # (theta >= 0 so IEEE bit patterns are order-preserving)
                tkeys = _pack_min(theta, pos, lane_m, bits_m, negate=False)
                trow = jnp.min(tkeys, axis=1, keepdims=True)  # (1, 1)
                t0 = trow[0, 0]
                any_pos = t0 != _INTMAX
                leave = jnp.bitwise_and(t0, jnp.int32((1 << bits_m) - 1))
                leave = jnp.where(any_pos, leave, 0)
                # truncated-mantissa theta: used only for the stall-progress
                # metric dz (tolerance-based), never for state updates.
                # Mosaic only bitcasts VECTORS, so unpack via the (1,1) row.
                best_t = lax.bitcast_convert_type(
                    jnp.bitwise_and(trow, jnp.int32(-(1 << bits_m))),
                    jnp.float32,
                )[0, 0]
                best_t = jnp.where(any_pos, best_t, jnp.inf)
            else:
                pos = d > pivot_tol
                # bfs clamped at 0: refactorization noise on degenerate
                # basics must not produce negative ratios
                # (see engine.primal_step)
                bfs_nn = jnp.maximum(bfs, 0.0)
                theta = jnp.where(
                    pos, bfs_nn / jnp.where(pos, d, jnp.ones_like(d)), jnp.inf
                )
                best_t = jnp.min(theta)
                any_pos = best_t < jnp.inf  # min(theta) finite iff some d>tol
                leave = jnp.min(jnp.where(pos & (theta == best_t), lane_m, m))
                leave = jnp.where(any_pos, leave, 0)

            do_pivot = eligible & any_pos & run
            stop_status = jnp.where(
                jnp.logical_not(eligible),
                st.OPTIMAL,
                jnp.where(eligible & jnp.logical_not(any_pos),
                          st.PRIMAL_UNBOUNDED, st.RUNNING),
            )

        at_leave = lane_m == leave  # (1, m)
        at_enter = lane_n == enter  # (1, n)
        if ablate == 6:  # PROFILING ONLY: skip the masked scalar extracts
            d_l = jnp.ones((), jnp.float32)
            bfs_l = jnp.zeros((), jnp.float32)
            leaving_col = jnp.zeros((), jnp.int32)
            c_enter = jnp.zeros((), jnp.float32)
            r_enter = jnp.zeros((), jnp.float32)
        else:
            # masked one-nonzero extracts, PACKED: one (3, m) lane reduction
            # instead of three separate full-row reductions (each row has a
            # single surviving element, so the packed sums are bit-exact)
            rows_m = jnp.concatenate(
                [jnp.where(at_leave, d, 0.0),
                 jnp.where(at_leave, bfs, 0.0),
                 jnp.where(at_leave, basis.astype(jnp.float32), 0.0)],
                axis=0,
            )  # (3, m)
            sums_m = jnp.sum(rows_m, axis=1, keepdims=True)  # (3, 1)
            d_l = sums_m[0, 0]
            bfs_l = sums_m[1, 0]
            # basis indices < 2^24: exact through the f32 packing
            leaving_col = sums_m[2, 0].astype(jnp.int32)
            if track_stall and not dual:
                rows_n = jnp.concatenate(
                    [jnp.where(at_enter, c_ref[0], 0.0),
                     jnp.where(at_enter, r, 0.0)], axis=0,
                )  # (2, n)
                sums_n = jnp.sum(rows_n, axis=1, keepdims=True)  # (2, 1)
                c_enter = sums_n[0, 0]
                r_enter = sums_n[1, 0]
            else:
                c_enter = jnp.sum(jnp.where(at_enter, c_ref[0], 0.0))
                r_enter = jnp.zeros((), jnp.float32)
        safe = jnp.where(d_l == 0, jnp.ones_like(d_l), d_l)
        u = -d / safe
        u = jnp.where(at_leave, 1.0 / safe - 1.0, u)
        u = jnp.where(do_pivot, u, jnp.zeros_like(u))  # (1, m)

        # ---- rank-1 eta update of inv_B^T:  invBT += (invBT e_l) u -------
        onehot_l = jnp.where(subl_m == leave, 1.0, 0.0)  # (m, 1)
        col_l = _dotg(invBT, onehot_l, 1, 0)  # (m, 1) col `leave` of inv_B^T
        if ablate != 3:  # ablate==3 (PROFILING ONLY): skip the O(m^2) update
            invBT_ref[0] = invBT + col_l * u
        bfs_ref[0] = bfs + u * bfs_l

        # ---- bookkeeping: basis, c_B, penalty ----------------------------
        if ablate != 7:  # ablate==7 (PROFILING ONLY): skip bookkeeping writes
            basis_ref[0] = jnp.where(
                at_leave & do_pivot, enter, basis
            ).astype(jnp.int32)
            cB_new = jnp.where(at_leave, c_enter, cB)
            cB_ref[0] = jnp.where(do_pivot, cB_new, cB)
            pen_new = jnp.where(
                at_enter,
                jnp.inf,
                jnp.where(lane_n == leaving_col, apen_ref[0], pen),
            )
            pen_ref[0] = jnp.where(do_pivot, pen_new, pen)

        if pricing == 2:
            # devex reference weights: gamma_j <- max(gamma_j,
            # (alpha_j/alpha_q)^2 gamma_q) with alpha the pivot row
            # (w = e_l' inv_B A, one extra O(mn) matmul) and the leaving
            # variable re-entering the nonbasic pool at gamma_q/alpha_q^2.
            gamma = gamma_ref[0]
            w = _dotg(col_l, A, 0, 0)  # (1, n) pivot row, alpha_q = d_l
            gamma_q = jnp.sum(jnp.where(at_enter, gamma, 0.0))
            gamma_q = jnp.maximum(gamma_q, 1.0)
            ratio2 = (w / safe) * (w / safe)
            gamma_new = jnp.maximum(gamma, ratio2 * gamma_q)
            g_leave = jnp.maximum(gamma_q / (safe * safe), 1.0)
            gamma_new = jnp.where(lane_n == leaving_col, g_leave, gamma_new)
            gamma_new = jnp.minimum(gamma_new, 1e12)
            gamma_ref[0] = jnp.where(do_pivot, gamma_new, gamma)

        # exact objective change of this pivot: theta * r_enter (primal,
        # zero on degenerate steps), -theta_d * bfs_leave (dual)
        if track_stall:
            if dual:
                dz = -best_d * bfs_l
            else:
                dz = best_t * r_enter
            dz = jnp.where(do_pivot, dz, 0.0)
        else:
            dz = jnp.zeros((), jnp.float32)

        if unroll > 1:
            status_new = jnp.where(run, stop_status, status).astype(jnp.int32)
            iters = iters + run.astype(jnp.int32)
        else:
            status_new = stop_status.astype(jnp.int32)
            iters = iters + 1
        return (seg + 1, iters, status_new, z + dz, dz, stall, bland)

    seg0 = jnp.zeros((), jnp.int32)
    iters0 = iters_in_ref[0, 0, 0]
    status0 = status_in_ref[0, 0, 0]
    if track_stall:  # progress scale: objective at segment entry
        z0 = jnp.sum(cB_in_ref[0] * bfs_in_ref[0])
    else:
        z0 = jnp.zeros((), jnp.float32)
    carry0 = (seg0, iters0, status0, z0,
              jnp.asarray(jnp.inf, jnp.float32),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    if unroll > 1:
        # run `unroll` gated iterations per loop trip: the while condition
        # (and its carry shuffle) is paid 1/unroll times per pivot
        def body(carry):
            for _ in range(unroll):
                carry = one_iter(carry)
            return carry
    else:
        body = one_iter
    out = lax.while_loop(cond, body, carry0)
    iters_out_ref[0, 0, 0] = out[1]
    status_out_ref[0, 0, 0] = out[2]


@functools.partial(
    jax.jit,
    static_argnames=("seg_len", "pricing", "opt_tol", "pivot_tol", "dual",
                     "feas_tol", "use_at", "stall_limit", "ablate", "split",
                     "unroll", "packed", "interpret"),
    donate_argnums=(6, 7, 8, 9, 10, 11),
)
def solve_segment(A, AT, Ahl, c_row, apen, maxiters, invBT, bfs, cB,
                  basis, pen, gamma, iters, status, *, seg_len: int,
                  pricing: int, opt_tol: float, pivot_tol: float,
                  dual: bool = False, feas_tol: float = 1e-6,
                  use_at: bool = True, stall_limit: int = 0, ablate: int = 0,
                  split: bool = False, unroll: int = 1, packed: bool = False,
                  interpret: bool | None = None):
    """Run up to ``seg_len`` simplex iterations per lane entirely in VMEM.

    Shapes: ``A[B, m, n]``, ``AT[B, n, m]``, ``c_row[B, 1, n]``,
    ``apen[B, 1, n]`` (allowed
    penalty: +inf on columns that may never enter), ``maxiters[1,1,1]`` i32,
    ``invBT[B, m, m]`` (the TRANSPOSED basis inverse), ``bfs[B, 1, m]``,
    ``cB[B, 1, m]``, ``basis[B, 1, m]`` i32, ``pen[B, 1, n]`` (current
    penalty: +inf on basis and disallowed columns), ``iters[B,1,1]`` i32,
    ``status[B,1,1]`` i32.

    Returns updated ``(invBT, bfs, cB, basis, pen, iters, status)``.
    """
    if interpret is None:
        interpret = _interpret_default()
    if split:
        if dual or pricing == 2 or not use_at:
            raise ValueError(
                "split pricing requires primal mode, bland/dantzig, and a "
                "resident A^T (the exact column/pivot-row paths need it)"
            )
        B, m, n2 = Ahl.shape
        n = n2 // 2
    else:
        B, m, n = A.shape
    kernel = functools.partial(
        _solve_segment_kernel, seg_len, pricing, opt_tol, pivot_tol,
        dual, feas_tol, use_at, stall_limit, ablate, split, max(1, unroll),
        packed,
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
            (pl.BlockSpec((1, 1, A.shape[2]), lane, memory_space=vmem)
             if split else
             pl.BlockSpec((1, m, n), lane, memory_space=vmem)),  # A (dummy
            # when split: pricing reads Ah/Al, the column comes from AT)
            (pl.BlockSpec((1, n, m), lane, memory_space=vmem) if use_at
             else pl.BlockSpec((1, 1, AT.shape[2]), lane,
                               memory_space=vmem)),  # AT (dummy if unused)
            (pl.BlockSpec((1, m, 2 * n), lane, memory_space=vmem) if split
             else pl.BlockSpec((1, 1, Ahl.shape[2]), lane,
                               memory_space=vmem)),  # [Ah|Al] (dummy if off)
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # c_row
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # apen
            pl.BlockSpec((1, 1, 1), shared, memory_space=smem),  # maxiters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # iters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # status
            pl.BlockSpec((1, m, m), lane, memory_space=vmem),  # invBT
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # bfs
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # cB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # basis
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # pen
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # gamma
        ],
        out_specs=(
            pl.BlockSpec((1, m, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), invBT.dtype),
            jax.ShapeDtypeStruct((B, 1, m), bfs.dtype),
            jax.ShapeDtypeStruct((B, 1, m), cB.dtype),
            jax.ShapeDtypeStruct((B, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, n), pen.dtype),
            jax.ShapeDtypeStruct((B, 1, n), gamma.dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3, 12: 4, 13: 5},
        interpret=interpret,
        # the default scoped-VMEM cap is 16 MB; v5e physically has 128 MiB
        # of VMEM.  Raising the cap moves the whole-in-VMEM kernel's size
        # cliff from m ~= 384 out to m ~= 1024 (measured need ~27.2 MB at
        # m=512 two-phase shapes).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(A, AT, Ahl, c_row, apen, maxiters, iters, status, invBT, bfs, cB,
      basis, pen, gamma)
    return outs
