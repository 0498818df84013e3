"""Streaming simplex mega-kernel: VMEM-resident factors, HBM-resident A^T.

The whole-segment kernel in :mod:`solve_kernel` keeps one lane's ENTIRE
working set (A, inv_B^T, vectors) in VMEM blocks managed by Mosaic's grid
pipeline.  Mosaic double-buffers every grid input and allocates separate
aliased output buffers, so the scoped allocation runs ~4x the naive operand
estimate (measured 27.2 MB at m=512 vs the 16 MB hard limit) -- the kernel
dies past m ~= 384-512 and the driver used to fall back to the ~5x-slower
per-op XLA path.

This kernel restructures the memory choreography for m in (~384, ~1500]:

* ``inv_B^T`` and ``A^T`` stay in **HBM** (``memory_space=ANY``) and are
  moved by explicit DMA into **scratch** buffers, which Mosaic does NOT
  double-buffer: one copy each, allocated once per lane.
* ``inv_B^T`` is DMA'd in at segment start, updated in place in VMEM for up
  to ``seg_len`` complete simplex iterations, and DMA'd back at segment end.
* the constraint matrix lives as ``A^T`` ``(n, m)`` -- NOT ``A``.  Every
  kernel contraction runs over the m axis, so ``A^T`` serves pricing and
  dual rows as dim-1 ``dot_general`` contractions (no transposes), and the
  entering column ``A[:, enter]`` becomes a dynamic SUBLANE slice
  ``AT[enter, :]`` -- *free*, where an ``A``-resident layout needed a
  one-hot matmul that read the whole slab (m*n*4 B per pivot: 12.6 MB at
  m=1024, measured as roughly a third of the per-pivot time).
    - *resident* mode (``a_resident=True``): one DMA of the whole ``A^T``
      lane slab at segment start.  Per-iteration HBM traffic: zero.
    - *streaming* mode (larger m): each pricing pass streams ``A^T`` in
      ``(n_blk, m)`` ROW blocks -- contiguous DMAs -- double-buffered and
      overlapped with the pricing matmul; the entering column is one
      contiguous row DMA.  Per-iteration HBM traffic: m*n*4 B (pricing)
      + m*4 B (column).
    - *partial (sectional) pricing* (``partial=True``, primal only, both
      variants): each iteration prices ONE ``(n_blk, m)`` section -- a
      sublane slice (resident) or a single contiguous DMA (streaming) --
      and selects the best eligible column WITHIN the section (classic
      partial pricing; Chvatal ch. 7).  The kernel stays in a section
      while it yields candidates, rotates to the next on exhaustion, and
      a full rotation of ``S = n / n_blk`` consecutive empty sections
      under an unchanged basis is a valid optimality proof.  Per-pivot
      pricing traffic drops ~S x for the classic ~10-30% pivot-count
      increase.  ``c``/``apen``/``pen`` are laid out ``(S, n_blk)`` so a
      section is a dynamic sublane slice; no (1, n) row is materialized.
* small state rows (bfs, c_B, basis, penalty) remain ordinary VMEM grid
  blocks -- a few KB each, double-buffering is irrelevant.

Iteration math (pricing -> selection -> ratio test -> rank-1 eta update ->
bookkeeping) is identical to :mod:`solve_kernel`; see its docstring for the
row-layout and HIGHEST-precision rules (both learned on v5e hardware).
Capability parity: revised simplex at sizes the reference handles in NumPy
(`/root/reference/linprog/primal_solvers.py:212-263`) without the VMEM
cliff.  Devex pricing is not offered here (its weight update needs a second
full pass over A per pivot); ``pricing`` covers bland/dantzig.
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

# above this m the rank-1 eta update runs row-blocked (see _eta below);
# module-level so tests can exercise the blocked path at CPU-sized m
_ETA_BLOCK_ABOVE_M = 1024


def _interpret_default():
    if jax.default_backend() in ("tpu", "axon"):
        return False
    # CPU/testing: the TPU interpreter understands DMAs + semaphores
    return pltpu.InterpretParams()


def _dotg(a, b, a_dim, b_dim):
    """2D dot_general contracting ``a_dim`` of a with ``b_dim`` of b."""
    return lax.dot_general(
        a, b, (((a_dim,), (b_dim,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _factor_rb(m: int) -> int:
    """Row-block size for the blocked-factor mode (must divide m)."""
    if m >= 4096 and m % 256 == 0:
        # smaller blocks at the top of the range: the m x m factor alone
        # is 67 MB at m=4096, so block temps must stay small (measured:
        # RB=512 put the scoped allocation at 106 MB)
        return 256
    if m >= 2048 and m % 512 == 0:
        return 512
    for rb in (8, 4, 2):
        if m % rb == 0 and rb < m:
            return rb
    return m


def _stream_kernel(seg_len: int, pricing: int, opt_tol: float,
                   pivot_tol: float, dual: bool, feas_tol: float,
                   a_resident: bool, n_blk: int, stall_limit: int,
                   partial: bool, packed: bool, factor_blocked: bool,
                   # inputs
                   AT_hbm, c_ref, apen_ref, maxiters_ref,
                   iters_in_ref, status_in_ref, invBT_hbm,
                   bfs_in_ref, cB_in_ref, basis_in_ref, pen_in_ref,
                   # outputs (invBT_out aliased to invBT_hbm, etc.)
                   invBT_out, bfs_ref, cB_ref, basis_ref, pen_ref,
                   iters_out_ref, status_out_ref,
                   # scratch
                   invbt_buf, a_buf, arow_buf, r_buf, u_buf, sem):
    i = pl.program_id(0)
    dantzig = pricing >= 1
    m = invbt_buf.shape[0]
    if partial:
        S = c_ref.shape[1]  # c/apen/pen laid out (1, S, n_blk)
        n = S * n_blk
    else:
        n = r_buf.shape[1] if not a_resident else a_buf.shape[0]
        lane_n = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_m = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    subl_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    if partial:
        lane_blk = lax.broadcasted_iota(jnp.int32, (1, n_blk), 1)

    # packed-key fused selection (see solve_kernel.pack_min_keys)
    from .solve_kernel import INTMAX as _INTMAX
    from .solve_kernel import pack_min_keys as _pack_min
    bits_n = max(1, ((n if not partial else n_blk) - 1).bit_length())
    bits_m = max(1, (m - 1).bit_length())
    lo_n = jnp.int32((1 << bits_n) - 1)
    lo_m = jnp.int32((1 << bits_m) - 1)

    # ---- stage state into scratch ---------------------------------------
    pltpu.make_async_copy(invBT_hbm.at[i], invbt_buf, sem.at[0]).start()
    if a_resident:
        pltpu.make_async_copy(AT_hbm.at[i], a_buf, sem.at[1]).start()
        pltpu.make_async_copy(AT_hbm.at[i], a_buf, sem.at[1]).wait()
    pltpu.make_async_copy(invBT_hbm.at[i], invbt_buf, sem.at[0]).wait()

    # small state rows: self-copy initializes the aliased outputs
    bfs_ref[0] = bfs_in_ref[0]
    cB_ref[0] = cB_in_ref[0]
    basis_ref[0] = basis_in_ref[0]
    pen_ref[0] = pen_in_ref[0]

    maxiters = maxiters_ref[0, 0, 0]
    nb = 0 if (a_resident or partial) else n // n_blk

    def _price_rows(rows):
        """rows [k, m] @ A -> [k, n], streamed over HBM A^T row blocks.

        Double-buffered: block j+1's (contiguous) DMA is in flight while
        block j multiplies.  Results land in full-length VMEM rows
        (r_buf/u_buf).
        """
        k = rows.shape[0]

        def a_dma(slot, j):
            return pltpu.make_async_copy(
                AT_hbm.at[i, pl.ds(j * n_blk, n_blk), :],
                a_buf.at[slot], sem.at[1 + slot],
            )

        a_dma(0, 0).start()

        def blk(j, _):
            slot = lax.rem(j, 2)
            nxt = lax.rem(j + 1, 2)

            @pl.when(j + 1 < nb)
            def _():
                a_dma(nxt, j + 1).start()

            a_dma(slot, j).wait()
            prod = _dotg(rows, a_buf[slot], 1, 1)  # (k, n_blk)
            r_buf[0, pl.ds(j * n_blk, n_blk)] = prod[0]
            if k > 1:
                u_buf[0, pl.ds(j * n_blk, n_blk)] = prod[1]
            return 0

        lax.fori_loop(0, nb, blk, 0, unroll=False)

    # stall escalation active only for the fast rules (bland is cycle-free)
    track_stall = stall_limit > 0 and pricing >= 1

    def cond(carry):
        seg, iters, status = carry[0], carry[1], carry[2]
        return (status == st.RUNNING) & (seg < seg_len) & (iters < maxiters)

    RB = _factor_rb(m)

    def _y_from_factor(cB):
        """y = c_B inv_B without materializing the m x m factor value.

        Output block j of y needs only rows [j0, j0+RB) of inv_B^T, so
        the factor is consumed in (RB, m) ref slices -- the whole-value
        read is what blows the scoped-VMEM budget past m ~= 2048."""
        parts = [
            _dotg(cB, invbt_buf[pl.ds(r0, RB), :], 1, 1)
            for r0 in range(0, m, RB)
        ]
        return jnp.concatenate(parts, axis=1)  # (1, m)

    def _d_from_factor(a_row):
        """d = (inv_B a)^T: contraction over factor ROWS, accumulated
        block by block."""
        d = jnp.zeros((1, m), jnp.float32)
        for k0 in range(0, m, RB):
            d = d + _dotg(
                lax.slice(a_row, (0, k0), (1, k0 + RB)),
                invbt_buf[pl.ds(k0, RB), :], 1, 0,
            )
        return d

    def body(carry):
        seg, iters, status, z, dz_prev, stall, bland, sec, empty = carry
        # blocked-factor mode never reads the whole factor as one value
        invBT = None if factor_blocked else invbt_buf[...]  # (m, m)
        bfs = bfs_ref[0]  # (1, m)
        cB = cB_ref[0]
        basis = basis_ref[0]

        # stalled-lane detection (see solve_kernel): no objective progress
        # over `stall_limit` pivots -> Bland's rule until progress resumes.
        # ``dz`` (exact per-pivot objective change) is carried, so no O(m)
        # objective reduction is paid per iteration.
        if track_stall:
            progressed = jnp.abs(dz_prev) > 1e-6 * (jnp.abs(z) + 1.0)
            stall = jnp.where(progressed, 0, stall + 1)
            bland = jnp.where(
                progressed, 0, jnp.where(stall >= stall_limit, 1, bland)
            )
            use_bland = bland != 0
        else:
            use_bland = jnp.zeros((), jnp.bool_)

        if dual:
            pen = pen_ref[0]  # (1, n)
            # ---- dual: leaving row first, then entering column ----------
            neg = bfs < -feas_tol
            if dantzig and packed:
                k0 = jnp.min(_pack_min(bfs, neg, lane_m, bits_m, True))
                viable = k0 != _INTMAX
                leave = jnp.bitwise_and(k0, lo_m)
                if track_stall:  # stalled: first infeasible row (Bland)
                    leave_b = jnp.min(jnp.where(neg, lane_m, m))
                    leave = jnp.where(use_bland, leave_b, leave)
            elif dantzig:
                worst = jnp.min(bfs)
                viable = worst < -feas_tol
                leave = jnp.min(jnp.where(bfs == worst, lane_m, m))
                if track_stall:  # stalled: first infeasible row (Bland)
                    leave_b = jnp.min(jnp.where(neg, lane_m, m))
                    leave = jnp.where(use_bland, leave_b, leave)
            else:
                leave = jnp.min(jnp.where(neg, lane_m, m))
                viable = leave < m
            leave = jnp.where(viable, leave, 0)
            # w = inv_B[leave, :] built ROW-oriented (a (m,1)->(1,m) reshape
            # would be a Mosaic transpose): contract e_leave with invBT dim 1
            onehot_lrow = jnp.where(lane_m == leave, 1.0, 0.0)  # (1, m)
            w = _dotg(onehot_lrow, invBT, 1, 1)  # (1, m)
            y = _dotg(cB, invBT, 1, 1)  # (1, m)
            if a_resident:
                urow = _dotg(w, a_buf[...], 1, 1)  # (1, n)
                r = c_ref[0] - _dotg(y, a_buf[...], 1, 1)
            else:
                _price_rows(jnp.concatenate([y, w], axis=0))
                r = c_ref[0] - r_buf[...]
                urow = u_buf[...]
            cand = (urow < -pivot_tol) & (pen == 0.0)
            theta_d = jnp.where(
                cand, -r / jnp.where(cand, urow, -jnp.ones_like(urow)),
                jnp.inf,
            )
            if packed:
                drow = jnp.min(
                    _pack_min(jnp.maximum(theta_d, 0.0), cand, lane_n,
                              bits_n, False),
                    axis=1, keepdims=True,
                )  # (1, 1)
                d0 = drow[0, 0]
                any_cand = d0 != _INTMAX
                enter = jnp.where(any_cand, jnp.bitwise_and(d0, lo_n), 0)
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
            do_pivot = viable & any_cand
            stop_status = jnp.where(
                jnp.logical_not(viable),
                st.OPTIMAL,
                jnp.where(viable & jnp.logical_not(any_cand),
                          st.DUAL_UNBOUNDED, st.RUNNING),
            )
        elif partial:
            # ---- primal, sectional pricing: one (n_blk, m) A^T section --
            start = sec * n_blk
            y = _dotg(cB, invBT, 1, 1)  # (1, m)
            if a_resident:
                at_sec = a_buf[pl.ds(start, n_blk), :]  # sublane slice
            else:
                sec_dma = pltpu.make_async_copy(
                    AT_hbm.at[i, pl.ds(start, n_blk), :], a_buf, sem.at[1]
                )
                sec_dma.start()
                sec_dma.wait()
                at_sec = a_buf[...]
            c_sec = c_ref[0, pl.ds(sec, 1), :]  # (1, n_blk) sublane slice
            pen_sec = pen_ref[0, pl.ds(sec, 1), :]
            r_sec = c_sec - _dotg(y, at_sec, 1, 1) + pen_sec  # (1, n_blk)
            negs = r_sec < -opt_tol
            if dantzig and packed:
                k0 = jnp.min(_pack_min(r_sec, negs, lane_blk, bits_n, True))
                eligible = k0 != _INTMAX
                enter_loc = jnp.bitwise_and(k0, lo_n)
                if track_stall:  # stalled: first eligible IN SECTION
                    enter_b = jnp.min(jnp.where(negs, lane_blk, n_blk))
                    enter_loc = jnp.where(use_bland, enter_b, enter_loc)
            elif dantzig:
                best = jnp.min(r_sec)
                enter_loc = jnp.min(
                    jnp.where(r_sec == best, lane_blk, n_blk)
                )
                eligible = best < -opt_tol
                if track_stall:  # stalled: first eligible IN SECTION
                    enter_b = jnp.min(jnp.where(negs, lane_blk, n_blk))
                    enter_loc = jnp.where(use_bland, enter_b, enter_loc)
            else:
                enter_loc = jnp.min(jnp.where(negs, lane_blk, n_blk))
                eligible = enter_loc < n_blk
            enter_loc = jnp.where(eligible, enter_loc, 0)
            enter = start + enter_loc
            # exhausted section: rotate; S consecutive empties under an
            # unchanged basis have priced every column -> optimality proof
            empty = jnp.where(eligible, 0, empty + 1)
            sec = jnp.where(eligible, sec, lax.rem(sec + 1, jnp.int32(S)))
            swept = empty >= S
        else:
            # ---- primal: pricing, then entering selection ---------------
            pen = pen_ref[0]  # (1, n)
            if factor_blocked:
                y = _y_from_factor(cB)  # (1, m)
            else:
                y = _dotg(cB, invBT, 1, 1)  # (1, m)
            if a_resident:
                r = c_ref[0] - _dotg(y, a_buf[...], 1, 1) + pen
            else:
                _price_rows(y)
                r = c_ref[0] - r_buf[...] + pen
            negr = r < -opt_tol
            if dantzig and packed:
                k0 = jnp.min(_pack_min(r, negr, lane_n, bits_n, True))
                eligible = k0 != _INTMAX
                enter = jnp.bitwise_and(k0, lo_n)
                if track_stall:  # stalled: first eligible column (Bland)
                    enter_b = jnp.min(jnp.where(negr, lane_n, n))
                    enter = jnp.where(use_bland, enter_b, enter)
            elif dantzig:
                best = jnp.min(r)
                enter = jnp.min(jnp.where(r == best, lane_n, n))
                eligible = best < -opt_tol
                if track_stall:  # stalled: first eligible column (Bland)
                    enter_b = jnp.min(jnp.where(negr, lane_n, n))
                    enter = jnp.where(use_bland, enter_b, enter)
            else:
                enter = jnp.min(jnp.where(negr, lane_n, n))
                eligible = enter < n
            enter = jnp.where(eligible, enter, 0)

        # ---- entering column: A[:, enter] == A^T[enter, :] --------------
        if a_resident:
            a_row = a_buf[pl.ds(enter, 1), :]  # (1, m) free sublane slice
        elif partial:
            # the entering column is inside the just-DMA'd section
            a_row = a_buf[pl.ds(enter_loc, 1), :]
        else:
            # one contiguous DMA: rows [enter_al, enter_al+8) of A^T.
            # Mosaic requires HBM slices 8-aligned in the sublane dim
            # ((8, 128) tiling), so fetch the aligned 8-row block holding
            # the entering row and select it with a VMEM sublane slice.
            # (fetch = n for sub-8 test shapes; n % 8 == 0 otherwise via
            # the n_blk divisibility requirement, so enter < n already
            # implies enter_al <= n - 8 -- no clamp, and the bare
            # (enter // 8) * 8 form is what Mosaic's divisibility prover
            # accepts for the HBM slice offset)
            fetch = 8 if n >= 8 else n
            if n >= 8:
                enter_al = pl.multiple_of((enter // 8) * 8, 8)
            else:
                enter_al = jnp.zeros((), jnp.int32)
            pltpu.make_async_copy(
                AT_hbm.at[i, pl.ds(enter_al, fetch), :], arow_buf, sem.at[3]
            ).start()
            pltpu.make_async_copy(
                AT_hbm.at[i, pl.ds(enter_al, fetch), :], arow_buf, sem.at[3]
            ).wait()
            a_row = arow_buf[pl.ds(enter - enter_al, 1), :]
        if factor_blocked:
            d = _d_from_factor(a_row)  # (1, m) = (inv_B a)^T
        else:
            d = _dotg(a_row, invBT, 1, 0)  # (1, m) = (inv_B a)^T

        if not dual:
            pos = d > pivot_tol
            # bfs clamped at 0 (refactorization noise; see engine.primal_step)
            bfs_nn = jnp.maximum(bfs, 0.0)
            theta = jnp.where(
                pos, bfs_nn / jnp.where(pos, d, jnp.ones_like(d)),
                jnp.inf,
            )
            if packed:
                trow = jnp.min(
                    _pack_min(theta, pos, lane_m, bits_m, False),
                    axis=1, keepdims=True,
                )  # (1, 1)
                t0 = trow[0, 0]
                any_pos = t0 != _INTMAX
                leave = jnp.where(any_pos, jnp.bitwise_and(t0, lo_m), 0)
                best_t = lax.bitcast_convert_type(
                    jnp.bitwise_and(trow, jnp.int32(-(1 << bits_m))),
                    jnp.float32,
                )[0, 0]
                best_t = jnp.where(any_pos, best_t, jnp.inf)
            else:
                best_t = jnp.min(theta)
                any_pos = best_t < jnp.inf  # min finite iff some d>tol
                leave = jnp.min(
                    jnp.where(pos & (theta == best_t), lane_m, m)
                )
                leave = jnp.where(any_pos, leave, 0)
            do_pivot = eligible & any_pos
            if partial:
                stop_status = jnp.where(
                    jnp.logical_not(eligible) & swept,
                    st.OPTIMAL,
                    jnp.where(eligible & jnp.logical_not(any_pos),
                              st.PRIMAL_UNBOUNDED, st.RUNNING),
                )
            else:
                stop_status = jnp.where(
                    jnp.logical_not(eligible),
                    st.OPTIMAL,
                    jnp.where(eligible & jnp.logical_not(any_pos),
                              st.PRIMAL_UNBOUNDED, st.RUNNING),
                )

        at_leave = lane_m == leave  # (1, m)
        # masked one-nonzero extracts, PACKED: one (3, m) lane reduction
        # instead of three separate full-row reductions (bit-exact: each
        # row has a single surviving element); see solve_kernel
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
        if partial:
            at_loc = lane_blk == enter_loc  # section-local extract
            rows_n = jnp.concatenate(
                [jnp.where(at_loc, c_sec, 0.0),
                 jnp.where(at_loc, r_sec, 0.0)], axis=0,
            )  # (2, n_blk)
            sums_n = jnp.sum(rows_n, axis=1, keepdims=True)
            c_enter = sums_n[0, 0]
            r_enter = sums_n[1, 0]
        else:
            at_enter = lane_n == enter  # (1, n)
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

        # ---- rank-1 eta update of inv_B^T (in VMEM scratch), predicated:
        # a no-pivot iteration (terminal check, or an exhausted section in
        # partial mode) skips the O(m^2) read-modify-write entirely
        def _bookkeeping():
            # ---- bookkeeping: basis, c_B, penalty -----------------------
            basis_ref[0] = jnp.where(at_leave, enter, basis).astype(jnp.int32)
            cB_ref[0] = jnp.where(at_leave, c_enter, cB)
            if partial:
                # pen is (S, n_blk); global column ids via a static grid
                iota_s = lax.broadcasted_iota(jnp.int32, (S, n_blk), 0)
                iota_l = lax.broadcasted_iota(jnp.int32, (S, n_blk), 1)
                gidx = iota_s * n_blk + iota_l
                pen2 = pen_ref[0]
                pen_ref[0] = jnp.where(
                    gidx == enter,
                    jnp.inf,
                    jnp.where(gidx == leaving_col, apen_ref[0], pen2),
                )
            else:
                pen2 = pen_ref[0]
                pen_ref[0] = jnp.where(
                    at_enter,
                    jnp.inf,
                    jnp.where(lane_n == leaving_col, apen_ref[0], pen2),
                )

        @pl.when(do_pivot)
        def _eta():
            onehot_l = jnp.where(subl_m == leave, 1.0, 0.0)  # (m, 1)
            if factor_blocked:
                # per-block: extract this block's slice of the leaving
                # column (it depends only on the block's own rows), then
                # update the block in place -- no whole-factor value ever
                for r0 in range(0, m, RB):
                    blk = invbt_buf[pl.ds(r0, RB), :]  # (RB, m)
                    colb = _dotg(blk, onehot_l, 1, 0)  # (RB, 1)
                    invbt_buf[pl.ds(r0, RB), :] = blk + colb * u
                bfs_ref[0] = bfs + u * bfs_l
                _bookkeeping()
                return
            col_l = _dotg(invBT, onehot_l, 1, 0)  # (m, 1)
            if m > _ETA_BLOCK_ABOVE_M:
                # row-blocked in-place update: the single-shot
                # ``invbt_buf[...] = invBT + col_l * u`` makes Mosaic
                # materialize ~2 extra m x m temporaries (the broadcast
                # product and the sum), which alone blow the scoped-VMEM
                # cap at m = 2048 (measured 110.95 MB vs the 100 MB
                # limit).  512-row blocks cap the temp at 4 MB.
                RB2 = 512 if m > 512 else 8
                for r0 in range(0, (m // RB2) * RB2, RB2):
                    invbt_buf[pl.ds(r0, RB2), :] = (
                        invbt_buf[pl.ds(r0, RB2), :]
                        + lax.slice(col_l, (r0, 0), (r0 + RB2, 1)) * u
                    )
                if m % RB2:
                    r0 = (m // RB2) * RB2
                    invbt_buf[pl.ds(r0, m - r0), :] = (
                        invbt_buf[pl.ds(r0, m - r0), :]
                        + lax.slice(col_l, (r0, 0), (m, 1)) * u
                    )
            else:
                invbt_buf[...] = invBT + col_l * u
            bfs_ref[0] = bfs + u * bfs_l
            _bookkeeping()

        # exact objective change of this pivot (see solve_kernel)
        if track_stall:
            if dual:
                dz = -best_d * bfs_l
            else:
                dz = best_t * r_enter
            dz = jnp.where(do_pivot, dz, 0.0)
        else:
            dz = jnp.zeros((), jnp.float32)

        return (seg + 1, iters + 1, stop_status.astype(jnp.int32),
                z + dz, dz, stall, bland, sec, empty)

    seg0 = jnp.zeros((), jnp.int32)
    iters0 = iters_in_ref[0, 0, 0]
    status0 = status_in_ref[0, 0, 0]
    if track_stall:  # progress scale: objective at segment entry
        z0 = jnp.sum(cB_in_ref[0] * bfs_in_ref[0])
    else:
        z0 = jnp.zeros((), jnp.float32)
    carry0 = (seg0, iters0, status0, z0,
              jnp.asarray(jnp.inf, jnp.float32),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    out = lax.while_loop(cond, body, carry0)
    iters_out_ref[0, 0, 0] = out[1]
    status_out_ref[0, 0, 0] = out[2]

    # ---- write the factor back to HBM (aliased in/out buffer) -----------
    pltpu.make_async_copy(invbt_buf, invBT_out.at[i], sem.at[0]).start()
    pltpu.make_async_copy(invbt_buf, invBT_out.at[i], sem.at[0]).wait()


@functools.partial(
    jax.jit,
    static_argnames=("seg_len", "pricing", "opt_tol", "pivot_tol", "dual",
                     "feas_tol", "a_resident", "n_blk", "stall_limit",
                     "partial", "packed", "factor_blocked", "interpret"),
    donate_argnums=(4, 5, 6, 7, 8),
)
def solve_segment_stream(AT, c_row, apen, maxiters, invBT, bfs, cB, basis,
                         pen, iters, status, *, seg_len: int, pricing: int,
                         opt_tol: float, pivot_tol: float, dual: bool = False,
                         feas_tol: float = 1e-6, a_resident: bool = True,
                         n_blk: int = 256, stall_limit: int = 0,
                         partial: bool = False, packed: bool = False,
                         factor_blocked: bool = False, interpret=None):
    """Run up to ``seg_len`` simplex iterations per lane (large-m regime).

    Shapes as :func:`solve_kernel.solve_segment` minus the devex weights:
    ``AT[B, n, m]`` (HBM; the kernel works exclusively from the transposed
    matrix -- see module docstring), ``c_row/apen/pen[B, 1, n]``,
    ``maxiters[1,1,1]``, ``invBT[B, m, m]`` (HBM-resident, updated in
    place), ``bfs/cB/basis[B, 1, m]``, ``iters/status[B, 1, 1]`` i32.
    Requires ``n % n_blk == 0`` in streaming or partial mode.

    ``partial=True`` (primal only) enables sectional pricing: the
    ``c_row/apen/pen`` rows are handled internally as ``(S, n_blk)`` tiles
    (reshaped views -- identical memory), one section priced per iteration.
    The returned ``pen`` keeps the ``[B, 1, n]`` contract.

    Returns ``(invBT, bfs, cB, basis, pen, iters, status)``.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, n, m = AT.shape
    if (partial or not a_resident) and n % n_blk != 0:
        raise ValueError(f"n={n} not divisible by n_blk={n_blk}")
    if partial and dual:
        raise ValueError("partial pricing: primal mode only")
    if factor_blocked and (dual or partial):
        raise ValueError("blocked-factor mode: plain primal only")
    kernel = functools.partial(
        _stream_kernel, seg_len, pricing, opt_tol, pivot_tol, dual,
        feas_tol, a_resident, n_blk, stall_limit, partial, packed,
        factor_blocked,
    )

    def lane(i):
        return (i, 0, 0)

    def shared(i):
        return (0, 0, 0)

    vmem = pltpu.VMEM
    smem = pltpu.SMEM
    anym = pl.ANY
    if partial:  # (S, n_blk) tiling: a section is one sublane slice
        S = n // n_blk
        row_blk = (1, S, n_blk)
        c_row = c_row.reshape(B, S, n_blk)
        apen = apen.reshape(B, S, n_blk)
        pen = pen.reshape(B, S, n_blk)
        pen_shape = (B, S, n_blk)
    else:
        row_blk = (1, 1, n)
        pen_shape = (B, 1, n)
    if a_resident:
        a_scr = pltpu.VMEM((n, m), jnp.float32)  # whole A^T slab
    elif partial:
        a_scr = pltpu.VMEM((n_blk, m), jnp.float32)  # one section
    else:
        a_scr = pltpu.VMEM((2, n_blk, m), jnp.float32)  # double-buffered
    r_len = 128 if partial else n  # partial never builds a full (1, n) row
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=anym),  # AT (full, HBM)
            pl.BlockSpec(row_blk, lane, memory_space=vmem),  # c_row
            pl.BlockSpec(row_blk, lane, memory_space=vmem),  # apen
            pl.BlockSpec((1, 1, 1), shared, memory_space=smem),  # maxiters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # iters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # status
            pl.BlockSpec(memory_space=anym),  # invBT (full, HBM)
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # bfs
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # cB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # basis
            pl.BlockSpec(row_blk, lane, memory_space=vmem),  # pen
        ],
        out_specs=(
            pl.BlockSpec(memory_space=anym),  # invBT
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # bfs
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # cB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # basis
            pl.BlockSpec(row_blk, lane, memory_space=vmem),  # pen
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # iters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # status
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), invBT.dtype),
            jax.ShapeDtypeStruct((B, 1, m), bfs.dtype),
            jax.ShapeDtypeStruct((B, 1, m), cB.dtype),
            jax.ShapeDtypeStruct((B, 1, m), jnp.int32),
            jax.ShapeDtypeStruct(pen_shape, pen.dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, m), jnp.float32),  # invbt_buf
            a_scr,  # a_buf
            pltpu.VMEM((min(8, n), m), jnp.float32),  # arow_buf (aligned fetch)
            pltpu.VMEM((1, r_len), jnp.float32),  # r_buf
            pltpu.VMEM((1, r_len), jnp.float32),  # u_buf
            pltpu.SemaphoreType.DMA((4,)),  # [0] factor/misc, [1-2] A, [3] col
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
        # the default scoped-VMEM cap is 16 MB; v5e physically has 128 MiB
        # of VMEM, so let Mosaic use most of it (Mosaic's scoped allocation
        # runs ~4x the operand estimate -- body temporaries etc.).  116 MB:
        # the blocked-factor mode at m=4096 measured 106 MB of scoped
        # allocation against the earlier 100 MB request.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024
        ),
    )(AT, c_row, apen, maxiters, iters, status, invBT, bfs, cB, basis, pen)
    if partial:  # restore the [B, 1, n] row contract for the driver
        outs = outs[:4] + (outs[4].reshape(B, 1, n),) + outs[5:]
    return outs
