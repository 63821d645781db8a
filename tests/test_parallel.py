"""Device-mesh utilities: sharding, assertion helper, hybrid mesh, distributed init.

Covers the distributed component of SURVEY.md §5.8 on the virtual 8-device
CPU mesh (conftest.py), mirroring how the reference stack's multi-device
discipline is validated without hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ambersim_tpu.parallel import mesh as pmesh


def test_make_mesh_and_shard_batch():
    m = pmesh.make_mesh()
    assert m.shape["batch"] == len(jax.devices())
    x = jnp.arange(32.0).reshape(16, 2)
    tree = {"a": x, "b": jnp.ones((16,))}
    sharded = pmesh.shard_batch(tree, m)
    pmesh.assert_sharded(sharded, m)  # should not raise


def test_assert_sharded_catches_replication():
    m = pmesh.make_mesh()
    if m.shape["batch"] == 1:
        pytest.skip("needs >1 device")
    replicated = pmesh.replicate({"a": jnp.ones((16, 2))}, m)
    with pytest.raises(AssertionError, match="not\\s+sharded"):
        pmesh.assert_sharded(replicated, m)


def test_assert_sharded_inside_jit_output():
    m = pmesh.make_mesh()

    @jax.jit
    def f(x):
        return pmesh.shard_batch(x * 2.0, m)

    out = f(jnp.ones((len(jax.devices()) * 4, 3)))
    pmesh.assert_sharded(out, m)


def test_make_hybrid_mesh_single_process():
    # Single-process: degenerates to (1, ndev) but keeps both axes usable.
    hm = pmesh.make_hybrid_mesh()
    ndev = len(jax.devices())
    assert hm.shape["dcn"] * hm.shape["batch"] == ndev
    # Full data parallelism over the flattened pair.
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(float(ndev * 2 * 3)).reshape(ndev * 2, 3)
    y = jax.device_put(x, NamedSharding(hm, P(("dcn", "batch"))))
    assert jnp.allclose(y, x)

    @jax.jit
    def step(v):
        return jnp.sum(v * v)

    assert float(step(y)) == float(jnp.sum(x * x))


def test_initialize_distributed_single_process_is_graceful():
    # No coordinator configured: must return False, not raise, and jax still works.
    assert pmesh.initialize_distributed() in (False, True)
    assert len(jax.devices()) >= 1
