"""Streaming-kernel vs XLA timing at large m (default 2048).

Historical note: ``_stream_variant`` originally bailed at m=2048; the
dispatch now serves ("stream", n_blk) there natively and
("stream_blocked", n_blk) up to m ~= 4096, so the forced-dispatch
monkeypatch below only matters for the --skip-xla=false comparison leg.

Run:  python benchmarks/stream_m2048.py --B 8 --maxiters 20000
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--maxiters", type=int, default=20000)
    ap.add_argument("--n-blk", type=int, default=256)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--seg", type=int, default=512)
    args = ap.parse_args()
    m = n = args.m

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
        c, G, h = device_inequality_lps(key, args.B, m, n)
        return device_standard_form_batch(c, G, h)

    cs, As, bs = gen(jax.random.PRNGKey(0))
    np.asarray(cs[0, :1])  # force

    cfg = SolverConfig(pricing="dantzig", refactor_every=args.seg,
                       kernels="pallas", polish_pivots=0,
                       packed_select=True)
    real_variant = engine_batched._stream_variant
    paths = [("stream", lambda mm, nn, **k: ("stream", args.n_blk))]
    if not args.skip_xla:
        paths.append(("xla", lambda mm, nn, **k: None))  # force XLA fallback
    out = {}
    for name, sv in paths:
        engine_batched._stream_variant = sv
        # the dispatch monkeypatch is read at TRACE time; identical static
        # args would otherwise hit the previous leg's jit cache entry
        jax.clear_caches()
        try:
            def run():
                return solve_batch_two_phase(cs, As, bs, args.maxiters,
                                             args.maxiters, cfg)

            t0 = time.time()
            s = batch_summary(run())  # compile + warm
            print(f"{name}: first run (incl compile) {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            s = batch_summary(run())
            dt = time.time() - t0
            out[name] = dt
            print(f"{name:<8} {dt:.3f} s  {args.B / dt:.2f} LPs/s  {s}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            engine_batched._stream_variant = real_variant

    if len(out) == 2:
        print(f"\nstream speedup vs xla: {out['xla'] / out['stream']:.2f}x")


if __name__ == "__main__":
    main()
