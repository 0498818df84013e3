"""TPU probe: m=4096 EXACT pipeline (IPM -> crossover -> fallback).

VERDICT r3 item 10: the XLA two-phase fallback runs 0.064 LPs/s at
m=4096; target >= 10x via IPM + stream-kernel crossover cleanup.
"""
import os, sys, time
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu.config import tuned_config
from linprog_tpu.crossover import ipm_crossover_batch_canonical
from linprog_tpu.generators import device_inequality_lps

m = n = 4096
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
seg = int(sys.argv[2]) if len(sys.argv) > 2 else 384
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 768
c, G, h = jax.jit(lambda k: device_inequality_lps(k, B, m, n))(
    jax.random.PRNGKey(0))
cfg = tuned_config(m, refactor_every=seg, polish_pivots=4, unroll=1)
print("cfg seg", seg, "budget", budget, "B", B, flush=True)
t0 = time.time()
res, crossed = ipm_crossover_batch_canonical(
    c, G, h, crossover_maxiters=budget, cfg=cfg, guess="tapia")
nc = int(np.asarray(crossed).sum())
print(f"compile+run {time.time()-t0:.1f}s crossed={nc}/{B}", flush=True)
t0 = time.time()
res, crossed = ipm_crossover_batch_canonical(
    c, G, h, crossover_maxiters=budget, cfg=cfg, guess="tapia")
nc = int(np.asarray(crossed).sum())
w = time.time() - t0
print(f"exact m=4096: {B/w:.3f} LPs/s wall={w:.2f}s crossed={nc}/{B} "
      f"iters={int(np.asarray(res.iters).sum())}", flush=True)
try:
    from scipy.optimize import linprog as slp
    ref = slp(np.asarray(c[0]), A_ub=np.asarray(G[0]), b_ub=np.asarray(h[0]),
              bounds=(0, None), method="highs")
    if ref.status == 0:
        gap = abs(float(res.cost[0]) - ref.fun) / max(1, abs(ref.fun))
        print(f"lane0 gap vs HiGHS: {gap:.3e}", flush=True)
except Exception as e:
    print("highs skipped:", e, flush=True)
