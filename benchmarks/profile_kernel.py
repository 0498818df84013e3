"""Mega-kernel per-iteration cost breakdown by ablation (VERDICT item 8).

Compiles the whole-segment kernel with individual hot ops removed
(`ablate`: 1 = pricing matmul, 2 = direction matmul, 3 = eta update) and
times one fixed 64-iteration segment per variant on the bench shapes.
The deltas attribute the per-lane-iteration microseconds to each op;
results are recorded in docs/DESIGN.md.

Run on TPU: python benchmarks/profile_kernel.py [--m 256] [--B 1024]
(each variant is a fresh Mosaic compile: minutes over the axon tunnel).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--seg", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="",
                    help="comma-separated variant names (e.g. 'full')")
    ap.add_argument("--stall", type=int, default=0,
                    help="stall_limit (bench default is 24; 0 disables)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="inner-loop unroll factor (SolverConfig.unroll)")
    ap.add_argument("--packed", action="store_true",
                    help="packed-key fused selection (packed_select)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    except Exception:
        pass

    from linprog_tpu import engine
    from linprog_tpu.config import SolverConfig
    from linprog_tpu.engine_batched import _pallas_pack
    from linprog_tpu.generators import (
        device_inequality_lps,
        device_standard_form_batch,
    )
    from linprog_tpu.ops.solve_kernel import solve_segment

    m, n, B, seg = args.m, args.n, args.B, args.seg
    cfg = SolverConfig(pricing="dantzig")

    @jax.jit
    def gen(key):
        c, G, h = device_inequality_lps(key, B, m, n)
        cs, As, bs = device_standard_form_batch(c, G, h)
        # slack starting basis (feasible): run pricing-rich phase-2-style
        # iterations without ever terminating inside one segment
        basis = jnp.broadcast_to(
            jnp.arange(n, n + m, dtype=jnp.int32), (B, m)
        )
        states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(As, bs, basis)
        allowed = jnp.ones((cs.shape[1],), bool)
        return cs, As, bs, states, allowed

    cs, As, bs, states, allowed = gen(jax.random.PRNGKey(0))
    maxit = jnp.full((1, 1, 1), 1 << 30, jnp.int32)

    def packed():
        pk = _pallas_pack(cs, As, states, allowed)
        return tuple(jnp.copy(x) for x in pk)

    AT = jnp.swapaxes(As, 1, 2)
    lane_iters = B * seg

    results = {}
    variants = [(0, "full"), (1, "no-pricing-matmul"),
                (2, "no-direction-matmul"), (3, "no-eta-update"),
                (4, "no-enter-selection"), (5, "no-ratio-test"),
                (6, "no-scalar-extracts"), (7, "no-bookkeeping")]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[1] in keep]
    for ablate, name in variants:
        def call(pk):
            c_row, apen, invBT, bfs, cB, basis, pen, gamma, it, stt = pk
            dummy = jnp.zeros((B, 1, 128), jnp.bfloat16)
            return solve_segment(
                As, AT, dummy, c_row, apen, maxit, invBT, bfs, cB,
                basis, pen, gamma, it, stt, seg_len=seg, pricing=1,
                opt_tol=cfg.opt_tol, pivot_tol=cfg.pivot_tol,
                use_at=True, ablate=ablate, stall_limit=args.stall,
                unroll=args.unroll, packed=args.packed,
            )

        out = call(packed())  # compile + warm
        np.asarray(out[-1])
        times = []
        for _ in range(args.reps):
            pk = packed()
            np.asarray(pk[-1])  # sync copies
            t0 = time.time()
            out = call(pk)
            np.asarray(out[-1])  # force
            times.append(time.time() - t0)
        dt = float(np.median(times))
        us = dt / lane_iters * 1e6
        results[name] = us
        print(f"{name:<22} {dt:.3f} s/segment  -> {us:.3f} us/lane-iter",
              flush=True)

    if "full" in results and len(results) > 1:
        full = results["full"]
        print("\nattribution (us/lane-iter):")
        parts = [k for k in results if k != "full"]
        for k in parts:
            print(f"  {k.replace('no-', ''):<20} {full - results[k]:+.3f}")
        explained = sum(full - results[k] for k in parts)
        print(f"  unexplained residual (loop/misc): {full - explained:.3f}")


if __name__ == "__main__":
    main()
