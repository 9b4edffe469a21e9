"""Mesh/sharding helper tests (8-device virtual CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.parallel import (
    make_mesh, data_sharding, replicated_sharding, shard_batch,
    all_gather_hosts)
from gangealing_tpu.parallel.mesh import pad_to_multiple, replicate


def test_mesh_and_shardings():
    assert jax.device_count() == 8
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.num_devices == 8
    # leading axis sharded: each device holds 2 rows
    assert not xs.sharding.is_fully_replicated
    r = replicate(mesh, {"a": jnp.ones((3,))})
    assert r["a"].sharding.is_fully_replicated


def test_sharded_computation_matches_single_device():
    mesh = make_mesh()
    x = jnp.arange(128.0).reshape(32, 4)

    @jax.jit
    def f(x):
        return jnp.sum(x ** 2, axis=1)

    a = np.asarray(f(x))
    b = np.asarray(f(shard_batch(mesh, x)))
    np.testing.assert_allclose(a, b)


def test_pad_to_multiple():
    x = np.arange(10)
    p, n = pad_to_multiple(x, 8)
    assert p.shape[0] == 16 and n == 10
    p2, n2 = pad_to_multiple(np.arange(16), 8)
    assert p2.shape[0] == 16 and n2 == 16


def test_all_gather_hosts_single_controller():
    x = np.arange(5)
    np.testing.assert_array_equal(all_gather_hosts(x), x)


def test_profiling_utils():
    from gangealing_tpu.utils.profiling import timed_call, throughput

    def f(x):
        return (x * 2).sum()

    dt = timed_call(f, jnp.ones((64, 64)), reps=2)
    assert dt >= 0.0
    assert throughput(f, 64, jnp.ones((64, 64)), reps=2) > 0
