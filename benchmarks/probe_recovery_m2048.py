"""TPU probe: m=2048 pooled-recovery overhead (VERDICT r4 item 5).

Round 4 measured raw 1.767 s -> recovered 3.595 s = 2.03x at m=2048
(target <= 2x; m=512/1024 hit 1.4-1.5x).  The pooled crossover bucket at
[bucket, 2048, 4096] still pays per-pivot costs; this sweeps the cleanup
config (refactor cadence / unroll / budget) to find the knee.

Run: PYTHONPATH=... nohup python benchmarks/probe_recovery_m2048.py > log &
"""
import os
import time

import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.config import tuned_config
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.ipm import (
    IPMConfig,
    ipm_solve_batch_canonical,
    recover_stragglers_pooled,
)

m = n = 2048
chunk, chunks = 16, 4
keys = jax.random.split(jax.random.PRNGKey(0), chunks)
gen = jax.jit(lambda k: device_inequality_lps(k, chunk, m, n))
batches = [gen(k) for k in keys]
cfg = IPMConfig(eps_rel=1e-3, maxiters=40, dtype="float32")

raw0 = ipm_solve_batch_canonical(*batches[0], cfg)
np.asarray(raw0.cost)
t0 = time.time()
raws = [ipm_solve_batch_canonical(*b, cfg) for b in batches]
raw_opt = sum(int((np.asarray(r.status) == stt.OPTIMAL).sum())
              for r in raws)
raw_wall = time.time() - t0
print(f"raw: {chunk*chunks/raw_wall:.2f} LPs/s wall={raw_wall:.3f}s "
      f"opt={raw_opt}/{chunk*chunks}", flush=True)

variants = [
    ("r128-u2-b2048", tuned_config(m, refactor_every=128, unroll=2), 2048),
    ("r256-u2-b2048", tuned_config(m, refactor_every=256, unroll=2), 2048),
    ("r384-u1-b2048",
     tuned_config(m, refactor_every=384, unroll=1, polish_pivots=4), 2048),
    ("r256-u2-b1024", tuned_config(m, refactor_every=256, unroll=2), 1024),
    ("r384-u2-b1536", tuned_config(m, refactor_every=384, unroll=2), 1536),
]
for name, rc, budget in variants:
    try:
        recover_stragglers_pooled(batches, raws, recover_cfg=rc,
                                  maxiters=budget)  # warm/compile
        t0 = time.time()
        raws2 = [ipm_solve_batch_canonical(*b, cfg) for b in batches]
        recs = recover_stragglers_pooled(batches, raws2, recover_cfg=rc,
                                         maxiters=budget)
        ns = sum(int((np.asarray(r.status) == stt.OPTIMAL).sum())
                 for r in recs)
        w = time.time() - t0
        print(f"{name}: recovered {chunk*chunks/w:.2f} LPs/s wall={w:.3f}s "
              f"ratio={w/raw_wall:.2f}x opt={ns}/{chunk*chunks}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
