"""TPU probe: m=1024 exact crossover -- Pallas cleanup + basis guesses.

VERDICT r3 item 2: ipm_xover_m1024 was 7.75 LPs/s on the XLA cleanup.
Measures the Pallas-kernel cleanup (router.exact_cleanup_config) with the
magnitude / tapia / slack basis guesses. Target >= 25 LPs/s, 32/32
crossed, gap <= 1e-6.
"""
import os, sys, time
import numpy as np

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu.crossover import ipm_crossover_batch_canonical
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.router import exact_cleanup_config

m = n = 1024
chunk = 32
c, G, h = jax.jit(lambda k: device_inequality_lps(k, chunk, m, n))(
    jax.random.PRNGKey(0))
cfg, budget = exact_cleanup_config(m)
print("cfg:", cfg, "budget:", budget, flush=True)

for guess in sys.argv[1:] or ("magnitude", "tapia", "slack"):
    t0 = time.time()
    res, crossed = ipm_crossover_batch_canonical(
        c, G, h, crossover_maxiters=budget, cfg=cfg, guess=guess)
    nc = int(np.asarray(crossed).sum())
    compile_wall = time.time() - t0
    t0 = time.time()
    res, crossed = ipm_crossover_batch_canonical(
        c, G, h, crossover_maxiters=budget, cfg=cfg, guess=guess)
    nc = int(np.asarray(crossed).sum())
    wall = time.time() - t0
    iters = int(np.asarray(res.iters).sum())
    print(f"guess={guess}: {chunk/wall:.2f} LPs/s wall={wall:.2f}s "
          f"crossed={nc}/{chunk} total_iters={iters} "
          f"(compile+run {compile_wall:.1f}s)", flush=True)

# HiGHS gap check on 1 lane
try:
    from scipy.optimize import linprog as slp
    ref = slp(np.asarray(c[0]), A_ub=np.asarray(G[0]), b_ub=np.asarray(h[0]),
              bounds=(0, None), method="highs")
    if ref.status == 0:
        gap = abs(float(res.cost[0]) - ref.fun) / max(1, abs(ref.fun))
        print(f"lane0 gap vs HiGHS: {gap:.3e}", flush=True)
except Exception as e:
    print("highs check skipped:", e)
