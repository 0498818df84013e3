"""A/B: AT-resident streaming kernel vs mega-kernel at mid sizes (m~512).

The dispatch in ``engine_batched.run_batched`` sends m=512 to the no-AT
mega-kernel (holds A, fetches the entering column via a one-hot O(mn)
matmul).  The AT-resident streaming kernel holds the SAME bytes (A^T
instead of A) but gets the column fetch as a free sublane slice.  This
script solves the same device batch through both paths (the stream path
is forced by monkeypatching ``_mega_kernel_fits`` to False) and compares.

Run on the default (TPU) env:
    PYTHONPATH=/root/repo python benchmarks/stream_vs_mega.py --m 512
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--maxiters", type=int, default=4000)
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

    from linprog_tpu import engine_batched
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

    cfg = SolverConfig(pricing="dantzig", refactor_every=192,
                       kernels="pallas", polish_pivots=0)
    real_fits = engine_batched._mega_kernel_fits
    out = {}
    for name, fits in [("mega", real_fits), ("stream", lambda *a, **k: False)]:
        engine_batched._mega_kernel_fits = fits
        # the dispatch monkeypatch is read at TRACE time; identical static
        # args would otherwise hit the previous leg's jit cache entry
        jax.clear_caches()
        try:
            def run():
                return solve_batch_two_phase(cs, As, bs, args.maxiters,
                                             args.maxiters, cfg)

            res = run()
            s = batch_summary(res)  # compile + warm
            t0 = time.time()
            for _ in range(args.reps):
                s = batch_summary(run())
            dt = (time.time() - t0) / args.reps
            out[name] = (dt, s, np.asarray(res.cost))
            print(f"{name:<8} {dt:.3f} s  {args.B / dt:.2f} LPs/s  "
                  f"pivots={s['total_pivots']}  {s}", flush=True)
        finally:
            engine_batched._mega_kernel_fits = real_fits

    (d_m, s_m, c_m), (d_s, s_s, c_s) = out["mega"], out["stream"]
    delta = np.max(np.abs(c_m - c_s) / np.maximum(1, np.abs(c_m)))
    print(f"\nstream speedup vs mega: {d_m / d_s:.3f}x   "
          f"max rel cost delta: {delta:.3e}")


if __name__ == "__main__":
    main()
