"""TPU probe: basis-guess comparison for the exact pipeline at m=256/512."""
import os, sys, time
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu.crossover import ipm_crossover_batch_canonical
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.router import exact_cleanup_config
from scipy.optimize import linprog as slp

for m, chunk in ((256, 1024), (512, 128)):
    c, G, h = jax.jit(lambda k: device_inequality_lps(k, chunk, m, m))(
        jax.random.PRNGKey(0))
    cfg, budget = exact_cleanup_config(m)
    for guess in ("magnitude", "tapia"):
        res, crossed = ipm_crossover_batch_canonical(
            c, G, h, crossover_maxiters=budget, cfg=cfg, guess=guess)
        np.asarray(res.cost)
        t0 = time.time()
        res, crossed = ipm_crossover_batch_canonical(
            c, G, h, crossover_maxiters=budget, cfg=cfg, guess=guess)
        nc = int(np.asarray(crossed).sum())
        wall = time.time() - t0
        iters = int(np.asarray(res.iters).sum())
        gaps = []
        for i in range(3):
            ref = slp(np.asarray(c[i]), A_ub=np.asarray(G[i]),
                      b_ub=np.asarray(h[i]), bounds=(0, None), method="highs")
            if ref.status == 0:
                gaps.append(abs(float(res.cost[i]) - ref.fun) / max(1, abs(ref.fun)))
        print(f"m={m} guess={guess}: {chunk/wall:.2f} LPs/s wall={wall:.2f}s "
              f"crossed={nc}/{chunk} iters={iters} maxgap3={max(gaps):.2e}",
              flush=True)
