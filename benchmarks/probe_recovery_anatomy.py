"""Split pooled-recovery wall: bare crossover vs host gather/scatter glue."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.crossover import crossover_batch_canonical
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.ipm import (IPMConfig, ipm_solve_batch_canonical,
                             recover_stragglers_pooled)
from linprog_tpu.router import exact_cleanup_config

for m, chunk in ((512, 128), (1024, 64)):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gen = jax.jit(lambda k: device_inequality_lps(k, chunk, m, m))
    batches = [gen(k) for k in keys]
    icfg = IPMConfig(eps_rel=1e-3, maxiters=40, dtype="float32")
    raws = [ipm_solve_batch_canonical(*b, icfg) for b in batches]
    [np.asarray(r.cost) for r in raws]
    # bare crossover on a pre-gathered bucket of 16
    bad = []
    for bi, r in enumerate(raws):
        for l in np.flatnonzero(np.asarray(r.status) != stt.OPTIMAL):
            bad.append((bi, int(l)))
    bucket = 16
    pick = [bad[k % len(bad)] for k in range(bucket)]
    cg = jnp.stack([batches[bi][0][l] for bi, l in pick])
    Gg = jnp.stack([batches[bi][1][l] for bi, l in pick])
    hg = jnp.stack([batches[bi][2][l] for bi, l in pick])
    xg = jnp.stack([raws[bi].x[l, :m] for bi, l in pick])
    cfg, budget = exact_cleanup_config(m)
    sub, crossed = crossover_batch_canonical(cg, Gg, hg, xg,
                                             maxiters=budget, cfg=cfg)
    np.asarray(crossed)
    t0 = time.time()
    sub, crossed = crossover_batch_canonical(cg, Gg, hg, xg,
                                             maxiters=budget, cfg=cfg)
    nc = int(np.asarray(crossed).sum())
    bare = time.time() - t0
    # full pooled call (gather + crossover + scatter)
    recover_stragglers_pooled(batches, raws)
    t0 = time.time()
    recover_stragglers_pooled(batches, raws)
    full = time.time() - t0
    print(f"m={m}: stragglers={len(bad)} bare-crossover {bare:.3f}s "
          f"({nc}/{bucket} crossed), pooled-total {full:.3f}s -> "
          f"glue {full-bare:.3f}s", flush=True)
