"""Re-tune refactor_every after compact refactorization.

The seg=320 knee was measured when every between-segment refactor cost a
full-batch inversion; compact_refactor changes the trade (late refactors
are nearly free), so the optimum may move down (less eta drift, fresher
bfs) or stay.  Prints LPs/s for a sweep at m=n=256, B=1024.
"""
import json
import sys
import time

import numpy as np


def main():
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

    m = n = 256
    chunk, chunks, maxiters = 1024, 4, 2000
    segs = [int(t) for t in (sys.argv[1].split(",") if len(sys.argv) > 1
                             else ["192", "256", "320", "448"])]

    @jax.jit
    def gen(key):
        c, G, h = device_inequality_lps(key, chunk, m, n)
        return device_standard_form_batch(c, G, h)

    keys = jax.random.split(jax.random.PRNGKey(0), chunks)
    data = [gen(k) for k in keys]

    for seg in segs:
        cfg = SolverConfig(
            pricing="dantzig", refactor_every=seg, kernels="pallas",
            refactor_method="inv", polish_pivots=8, unroll=4,
        )
        # warm
        r0 = solve_batch_two_phase(*data[0], maxiters, maxiters, cfg)
        s0 = batch_summary(r0)
        t0 = time.time()
        tot_p = 0
        outs = [solve_batch_two_phase(*d, maxiters, maxiters, cfg) for d in data]
        opt = 0
        for r in outs:
            s = batch_summary(r)
            tot_p += s["total_pivots"]
            opt += s["optimal"]
        wall = time.time() - t0
        print(json.dumps({
            "seg": seg,
            "lps_per_sec": round(chunk * chunks / wall, 1),
            "pivots_per_sec": round(tot_p / wall, 1),
            "optimal": opt,
            "of": chunk * chunks,
        }), flush=True)


if __name__ == "__main__":
    main()
