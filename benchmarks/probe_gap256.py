"""Chase the 6.4e-6 HiGHS gap seen on a crossed m=256 lane."""
import os, time, sys
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu.crossover import ipm_crossover_batch_canonical
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.router import exact_cleanup_config
from scipy.optimize import linprog as slp

m, chunk = 256, 1024
c, G, h = jax.jit(lambda k: device_inequality_lps(k, chunk, m, m))(
    jax.random.PRNGKey(0))
cfg, budget = exact_cleanup_config(m)
for pp in (8, 16):
    cfgp = cfg.replace(polish_pivots=pp)
    res, crossed = ipm_crossover_batch_canonical(
        c, G, h, crossover_maxiters=budget, cfg=cfgp, guess="tapia")
    gaps = []
    for i in range(16):
        ref = slp(np.asarray(c[i]), A_ub=np.asarray(G[i]),
                  b_ub=np.asarray(h[i]), bounds=(0, None), method="highs")
        if ref.status == 0:
            gaps.append(abs(float(res.cost[i]) - ref.fun) / max(1, abs(ref.fun)))
    gaps = np.asarray(gaps)
    print(f"pp={pp}: crossed={int(np.asarray(crossed).sum())}/{chunk} "
          f"maxgap16={gaps.max():.2e} gaps>1e-6: {int((gaps>1e-6).sum())} "
          f"argmax={gaps.argmax()}", flush=True)
