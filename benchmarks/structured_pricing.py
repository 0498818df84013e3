"""Pricing-rule comparison on the structured (netlib-style) suite.

Devex reference-weight pricing was measured 48% WORSE than Dantzig on the
iid-gaussian bench distribution (isotropic columns -- Dantzig is near
optimal there).  Structured/degenerate instances are the regime devex was
built for; this script measures total pivots per rule over the committed
structured suite, padded into one batch and solved by the mega-kernel
(interpret mode on CPU, compiled on TPU).

Run:  python benchmarks/structured_pricing.py [--pallas]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="use the Pallas mega-kernel (default: XLA path; "
                    "devex requires --pallas)")
    ap.add_argument("--maxiters", type=int, default=3000)
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        jax.config.update("jax_platforms", "cpu")

    from linprog_tpu import SimplexSolver, SolverConfig, forms
    from linprog_tpu.batch import solve_batch_general
    from linprog_tpu.structured import default_suite
    from scipy.optimize import linprog as highs

    suite = default_suite()
    problems = []
    solvers = []
    refs = []
    for p in suite:
        s = SimplexSolver(p["c"], A=p["A"], b=p["b"], G=p["G"], h=p["h"],
                          lb=p["lb"], ub=p["ub"])
        c1, A1, b1 = forms.bounds_to_rows(s.c, s.A, s.b, s.lb, s.ub)
        problems.append({"c": c1, "A": A1, "b": b1})
        solvers.append(s)
        n = p["c"].shape[0]
        lb = np.zeros(n) if p["lb"] is None else p["lb"]
        ub = np.full(n, np.inf) if p["ub"] is None else p["ub"]
        ref = highs(
            p["c"], A_eq=p["A"], b_eq=p["b"], A_ub=p["G"], b_ub=p["h"],
            bounds=list(zip(
                [None if np.isneginf(v) else v for v in lb],
                [None if np.isposinf(v) else v for v in ub],
            )),
            method="highs",
        )
        refs.append(ref.fun)

    kernels = "pallas" if args.pallas else "xla"
    rules = ["dantzig", "devex", "bland"] if args.pallas else [
        "dantzig", "bland"
    ]
    table = {}
    for rule in rules:
        cfg = SolverConfig(pricing=rule, refactor_every=64, kernels=kernels)
        res = solve_batch_general(
            problems, args.maxiters, args.maxiters, cfg
        )
        pivots = [r.iters for r in res]
        # map x back through the solver's free-variable/shift transforms,
        # then score against the oracle objective in the ORIGINAL space
        gaps = []
        for p, s, r, f in zip(suite, solvers, res, refs):
            x_orig = s._reconstruct_x(np.asarray(r.x)[: s.n_aug])
            gaps.append(abs(float(np.dot(p["c"], x_orig)) - f)
                        / max(1.0, abs(f)))
        table[rule] = (pivots, gaps)

    names = [p["name"] for p in suite]
    hdr = f"{'instance':<22}" + "".join(f"{r:>10}" for r in rules) + "  maxgap"
    print(hdr)
    print("-" * len(hdr))
    for i, nm in enumerate(names):
        row = f"{nm:<22}" + "".join(
            f"{table[r][0][i]:>10}" for r in rules
        )
        mg = max(table[r][1][i] for r in rules)
        print(row + f"  {mg:.1e}")
    print("-" * len(hdr))
    tot = f"{'TOTAL pivots':<22}" + "".join(
        f"{sum(table[r][0]):>10}" for r in rules
    )
    print(tot)
    for r in rules:
        print(f"max rel gap [{r}]: {max(table[r][1]):.2e}")


if __name__ == "__main__":
    main()
