"""Tune the pooled-recovery crossover (budget, seg, polish) for <=2x raw."""
import os, time
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.config import tuned_config
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.ipm import (IPMConfig, ipm_solve_batch_canonical,
                             recover_stragglers_pooled)

for m, chunk in ((512, 128), (1024, 64)):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gen = jax.jit(lambda k: device_inequality_lps(k, chunk, m, m))
    batches = [gen(k) for k in keys]
    icfg = IPMConfig(eps_rel=1e-3, maxiters=40, dtype="float32")
    raws = [ipm_solve_batch_canonical(*b, icfg) for b in batches]
    [np.asarray(r.cost) for r in raws]
    t0 = time.time()
    raws = [ipm_solve_batch_canonical(*b, icfg) for b in batches]
    pre = sum(int((np.asarray(r.status) == stt.OPTIMAL).sum()) for r in raws)
    raw_wall = time.time() - t0
    print(f"m={m}: raw {raw_wall:.3f}s, {pre}/{4*chunk} optimal", flush=True)
    for budget, seg, pp in ((None, None, 8), (256, 256, 8), (256, 384, 4),
                            (384, 384, 8)):
        cfg = None if budget is None else tuned_config(
            m, refactor_every=seg, polish_pivots=pp,
            unroll=2 if m > 512 else 4)
        recover_stragglers_pooled(batches, raws, recover_cfg=cfg,
                                  maxiters=budget)  # compile
        t0 = time.time()
        recs = recover_stragglers_pooled(batches, raws, recover_cfg=cfg,
                                         maxiters=budget)
        w = time.time() - t0
        post = sum(int((np.asarray(r.status) == stt.OPTIMAL).sum())
                   for r in recs)
        print(f"  budget={budget} seg={seg} pp={pp}: recovery {w:.3f}s "
              f"ratio {(raw_wall+w)/raw_wall:.2f}x  {pre}->{post}", flush=True)
