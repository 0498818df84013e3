"""Distributed helpers (single-process semantics) + batched bounded solve."""

import jax
import jax.numpy as jnp
import numpy as np

from linprog_tpu import status as st
from linprog_tpu.batch import solve_batch_bounded
from linprog_tpu.parallel import distributed


def test_distributed_single_process_noop():
    distributed.initialize()  # must be a no-op, not raise
    info = distributed.process_summary()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8


def test_global_meshes():
    mesh = distributed.global_batch_mesh()
    assert mesh.shape["batch"] == 8
    mesh2 = distributed.global_2d_mesh(model_size=2)
    assert mesh2.shape == {"batch": 4, "model": 2}
    try:
        distributed.global_2d_mesh(model_size=3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_solve_batch_bounded_matches_single():
    # Bazaraa ex 5.6 across lanes with scaled costs
    c = np.array([-2.0, -4.0, -1.0, 0.0, 0.0], np.float32)
    A = np.array([[2.0, 1.0, 1.0, 1.0, 0.0], [1.0, 1.0, -1.0, 0.0, 1.0]],
                 np.float32)
    b = np.array([10.0, 4.0], np.float32)
    lb = np.array([0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
    ub = np.array([4.0, 6.0, 4.0, 1e6, 1e6], np.float32)
    B = 3
    res = solve_batch_bounded(
        jnp.asarray(np.stack([c * (k + 1) for k in range(B)])),
        jnp.tile(jnp.asarray(A), (B, 1, 1)),
        jnp.tile(jnp.asarray(b), (B, 1)),
        jnp.tile(jnp.asarray(lb), (B, 1)),
        jnp.tile(jnp.asarray(ub), (B, 1)),
        jnp.tile(jnp.asarray([3, 4], jnp.int32), (B, 1)),
        jnp.tile(jnp.asarray([0, 0, 0, 2, 2], jnp.int8), (B, 1)),
        100,
    )
    assert (np.asarray(res.status) == st.OPTIMAL).all()
    expected = np.array([2 / 3, 6.0, 8 / 3, 0.0, 0.0])
    for i in range(B):
        assert np.allclose(np.asarray(res.x)[i], expected, atol=1e-3)
