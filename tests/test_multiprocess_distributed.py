"""The distributed layer, exercised for real.

1. DP x TP on a 2-D (batch, model) mesh (``global_2d_mesh`` +
   ``tp_solve_batch``): every lane's column-sharded solve must match the
   single-device engine exactly (basis and status).
2. A genuine TWO-OS-PROCESS run: both workers call
   ``jax.distributed.initialize`` against a local coordinator on the CPU
   backend (2 virtual devices each -> a 4-device global mesh), solve a
   batch sharded across processes, and must agree with the parent's
   single-process solve.
"""

import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import SolverConfig, engine
from linprog_tpu import status as st
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch
from linprog_tpu.parallel import tp_solve_batch
from linprog_tpu.parallel.distributed import global_2d_mesh, process_summary


def test_dp_x_tp_on_2d_mesh():
    mesh = global_2d_mesh(model_size=2)  # 4 x 2 over the 8 virtual devices
    assert mesh.shape == {"batch": 4, "model": 2}

    B, m, n = 8, 6, 16
    c, G, h = random_inequality_lps(B, m, n - m, seed=21)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    basis = jnp.broadcast_to(jnp.arange(n - m, n, dtype=jnp.int32), (B, m))
    cfg = SolverConfig(pricing="dantzig")

    out = tp_solve_batch(cs, As, bs, basis, 200, mesh, cfg)

    # single-device reference (vmapped per-lane engine)
    states = jax.vmap(engine.make_state, in_axes=(0, 0, 0))(As, bs, basis)
    allowed = jnp.ones((n,), bool)
    ref = jax.vmap(
        engine.run, in_axes=(0, 0, 0, 0, None, None, None, None)
    )(cs, As, bs, states, allowed, 200, cfg, "primal")

    assert np.array_equal(np.asarray(out.status), np.asarray(ref.status))
    assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
    assert (np.asarray(out.status) == st.OPTIMAL).all()
    np.testing.assert_allclose(
        np.asarray(out.bfs), np.asarray(ref.bfs), atol=2e-4, rtol=2e-4
    )


def test_process_summary_single():
    s = process_summary()
    assert s["process_count"] == 1 and s["global_devices"] == 8


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, coord = int(sys.argv[1]), sys.argv[2]
from linprog_tpu.parallel import distributed
distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch
from linprog_tpu.batch import solve_batch_two_phase
from linprog_tpu.config import SolverConfig

cfg = SolverConfig(pricing="dantzig", refactor_every=16)
c, G, h = random_inequality_lps(8, 6, 8, seed=42)
cs, As, bs = to_standard_form_batch(c, G, h)
mesh = distributed.global_batch_mesh()

def put(x):
    sh = NamedSharding(mesh, P(*(["batch"] + [None] * (x.ndim - 1))))
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

res = solve_batch_two_phase(put(cs), put(As), put(bs), 200, 200, cfg)
costs = np.asarray(
    multihost_utils.process_allgather(res.cost, tiled=True)
).ravel()
status = np.asarray(
    multihost_utils.process_allgather(res.status, tiled=True)
).ravel()
assert (status == 1).all(), status
print("COSTS", ",".join(f"{v:.6f}" for v in costs), flush=True)
print("WORKER_OK", pid, flush=True)
"""


def test_two_process_distributed_solve(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    portno = port.getsockname()[1]
    port.close()
    coord = f"localhost:{portno}"

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd="/root/repo", text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out, f"worker {i} failed:\n{out[-3000:]}"

    # both processes saw identical global costs
    def costs_of(out):
        line = [ln for ln in out.splitlines() if ln.startswith("COSTS")][0]
        return np.array([float(v) for v in line.split(" ", 1)[1].split(",")])

    c0, c1 = costs_of(outs[0]), costs_of(outs[1])
    np.testing.assert_array_equal(c0, c1)

    # ... and they match the parent's single-process solve
    from linprog_tpu.batch import solve_batch_two_phase

    cfg = SolverConfig(pricing="dantzig", refactor_every=16)
    c, G, h = random_inequality_lps(8, 6, 8, seed=42)
    cs, As, bs = to_standard_form_batch(c, G, h)
    ref = solve_batch_two_phase(
        jnp.asarray(cs, jnp.float32), jnp.asarray(As, jnp.float32),
        jnp.asarray(bs, jnp.float32), 200, 200, cfg,
    )
    np.testing.assert_allclose(c0, np.asarray(ref.cost), atol=2e-4, rtol=2e-4)
