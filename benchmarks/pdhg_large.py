"""Large single-instance LP via the first-order PDHG solver on TPU.

Dense LPs beyond m ~ 1000 make simplex factorization the bottleneck; the
PDHG family is pure matvecs and scales with HBM bandwidth.  This benchmark
solves one feasible-bounded dense instance per size, self-certifies with
relative KKT residuals, and (at sizes where it finishes in reasonable time)
cross-checks the objective against single-core HiGHS.

Run: python benchmarks/pdhg_large.py [--sizes 1024 2048 4096] [--highs-max 1024]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build_instance(n: int, seed: int):
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((n, n), dtype=np.float32) / np.sqrt(n)
    x0 = rng.random(n, dtype=np.float32)
    h = G @ x0 + rng.random(n, dtype=np.float32)
    y0 = rng.random(n, dtype=np.float32)
    s = 0.1 + 0.9 * rng.random(n, dtype=np.float32)
    c = s - G.T @ y0
    return c, G, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1024, 2048, 4096])
    ap.add_argument("--highs-max", type=int, default=1024,
                    help="largest size to cross-check against HiGHS")
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--halpern", action="store_true",
                    help="reflected Halpern acceleration (-30% iters)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from linprog_tpu.pdhg import PDHGConfig, PDHGSolver

    for n in args.sizes:
        c, G, h = build_instance(n, seed=0)
        cfg = PDHGConfig(eps_rel=args.eps, maxiters=200_000, check_every=100,
                         restart_every=1000, halpern=args.halpern)
        solver = PDHGSolver(c=c, G=G, h=h, config=cfg)
        res = solver.solve()  # compile + warm
        t0 = time.time()
        res = solver.solve()
        wall = time.time() - t0

        line = (
            f"n={n}: {'OPTIMAL' if res.optimum else res.status_name} "
            f"in {res.iters} iters, {wall:.2f}s "
            f"(warm), cost={res.cost:.4f}"
        )
        if n <= args.highs_max:
            try:
                from scipy.optimize import linprog as scipy_linprog

                t0 = time.time()
                ref = scipy_linprog(
                    c, A_ub=G, b_ub=h, bounds=(0, None), method="highs"
                )
                t_h = time.time() - t0
                gap = abs(res.cost - ref.fun) / max(1.0, abs(ref.fun))
                line += (
                    f" | HiGHS: {t_h:.1f}s cost={ref.fun:.4f} "
                    f"rel-gap={gap:.2e}"
                )
            except Exception as e:  # noqa: BLE001
                line += f" | HiGHS failed: {e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
