"""A/B: sectional partial pricing vs full pricing in the streaming kernel.

Solves the SAME device-generated batch at m=n (default 1024) with
``SolverConfig.partial_pricing`` off and on, and reports wall time, pivot
counts, lane statuses, and max |cost delta| between the two runs.  The
classic trade-off being measured: ~S x less pricing traffic per pivot vs
a 10-30% pivot-count increase (Chvatal ch. 7 'partial pricing').

Run on the default (TPU) env:  python benchmarks/partial_ab.py --m 1024
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--n", type=int, default=0, help="default: =m")
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--maxiters", type=int, default=8000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    n = args.n or args.m

    import jax

    try:
        import os
        os.makedirs("/root/.cache/jax_comp", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from linprog_tpu.batch import batch_summary, solve_batch_two_phase
    from linprog_tpu.config import SolverConfig
    from linprog_tpu.generators import (
        device_inequality_lps,
        device_standard_form_batch,
    )

    @jax.jit
    def gen(key):
        c, G, h = device_inequality_lps(key, args.B, args.m, n)
        return device_standard_form_batch(c, G, h)

    cs, As, bs = gen(jax.random.PRNGKey(0))
    np.asarray(cs[0, :1])  # force

    base = SolverConfig(pricing="dantzig", refactor_every=192,
                        kernels="pallas", polish_pivots=0)
    out = {}
    for name, cfg in [("full", base),
                      ("partial", base.replace(partial_pricing=True))]:
        def run():
            return solve_batch_two_phase(cs, As, bs, args.maxiters,
                                         args.maxiters, cfg)

        res = run()
        s = batch_summary(res)  # compile + warm (forces readback)
        t0 = time.time()
        for _ in range(args.reps):
            s = batch_summary(run())
        dt = (time.time() - t0) / args.reps
        out[name] = (dt, s, np.asarray(res.cost))
        print(f"{name:<8} {dt:.3f} s  {args.B / dt:.2f} LPs/s  "
              f"pivots={s['total_pivots']}  {s}", flush=True)

    d_full, s_full, c_full = out["full"]
    d_part, s_part, c_part = out["partial"]
    both_opt = None
    if "partial" in out:
        delta = np.max(np.abs(c_full - c_part) / np.maximum(1, np.abs(c_full)))
        print(f"\nspeedup: {d_full / d_part:.3f}x   "
              f"pivot ratio: {s_part['total_pivots'] / max(1, s_full['total_pivots']):.3f}   "
              f"max rel cost delta: {delta:.3e}")


if __name__ == "__main__":
    main()
