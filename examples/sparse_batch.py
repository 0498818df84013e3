"""Batched SPARSE first-order solving of structured LPs.

Structured LP families (transportation, assignment, network flow) share
one sparsity pattern across instances: only the data (costs, supplies,
demands) varies.  ``pdhg_solve_batch_sparse`` exploits exactly that --
ONE COO pattern copy (``rows/cols[nnz]``) serves the whole batch, and
per-lane storage is just the ``nnz`` values, so memory scales
``O(B * nnz)`` instead of ``O(B * m * n)``.  A transportation incidence
matrix has ``nnz = 2 * ns * nd`` of ``(ns + nd) * ns * nd`` entries --
at 32 x 32 that is a 16x reduction; the matvecs (gather + segment-sum)
shrink by the same factor.

Run:  python examples/sparse_batch.py [batch] [n_supply] [n_demand]
"""

import sys

import numpy as np


def main(batch: int = 32, ns: int = 8, nd: int = 10) -> None:
    from linprog_tpu import status as st
    from linprog_tpu.generators import transportation_lps
    from linprog_tpu.pdhg import PDHGConfig, pdhg_solve_batch_sparse

    c, A, b, = transportation_lps(batch, ns, nd, seed=7)
    B, m, n = A.shape

    # shared pattern: every lane has the same incidence structure
    rows, cols = np.nonzero(A[0])
    vals = A[:, rows, cols]  # [B, nnz]
    nnz = rows.size
    print(f"{B} transportation LPs ({ns}x{nd}): m={m}, n={n}, "
          f"nnz={nnz} ({nnz / (m * n):.1%} dense)")
    print(f"sparse batch storage: {vals.nbytes / 1e3:.1f} kB values "
          f"+ {rows.nbytes * 2 / 1e3:.1f} kB shared pattern "
          f"(dense: {A.nbytes / 1e3:.1f} kB)")

    cfg = PDHGConfig(eps_rel=1e-6, dtype="float64")
    states = pdhg_solve_batch_sparse(
        c, rows, cols, vals, b, n_eq=m,
        lb=np.zeros((B, n)), ub=np.full((B, n), np.inf),
        shape=(m, n), maxiters=200_000, cfg=cfg,
    )
    status = np.asarray(states.status)
    costs = np.einsum("bn,bn->b", c, np.asarray(states.x))
    print(f"optimal: {(status == st.OPTIMAL).sum()}/{B}, "
          f"mean cost {costs.mean():.4f}")

    # cross-check a few lanes against the exact simplex path
    try:
        from scipy.optimize import linprog as highs

        worst = 0.0
        for i in range(min(4, B)):
            ref = highs(c[i], A_eq=A[i], b_eq=b[i], bounds=(0, None),
                        method="highs")
            if ref.status == 0:
                worst = max(worst, abs(costs[i] - ref.fun) / abs(ref.fun))
        print(f"max rel gap vs HiGHS on {min(4, B)} lanes: {worst:.2e}")
    except ImportError:
        pass


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
