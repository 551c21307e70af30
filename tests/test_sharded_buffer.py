"""Slot-sharded buffer: strategies produce identical results under sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.buffer.reservoir import reservoir_update
from ocl_tpu.buffer.retrieve import class_balanced_sample, random_retrieve
from ocl_tpu.buffer.state import init_buffer
from ocl_tpu.parallel.mesh import get_mesh
from ocl_tpu.parallel.sharded_buffer import shard_buffer


def _filled_buffer(mem=64):
    buf = init_buffer(mem, "synthetic")
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        x = jnp.full((8, 32, 32, 3), float(i), jnp.float32)
        y = jnp.full((8,), i % 10, jnp.int32)
        buf, _ = reservoir_update(buf, x, y, sub)
    return buf


def test_sharded_retrieval_matches_unsharded():
    mesh = get_mesh(8)
    buf = _filled_buffer()
    sbuf = shard_buffer(buf, mesh)
    key = jax.random.PRNGKey(7)

    with mesh:
        a = jax.jit(lambda b: random_retrieve(b, 16, key))(buf)
        b = jax.jit(lambda b: random_retrieve(b, 16, key))(sbuf)
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb))

    with mesh:
        ca = jax.jit(lambda b: class_balanced_sample(b, 2, key))(buf)
        cb = jax.jit(lambda b: class_balanced_sample(b, 2, key))(sbuf)
    for xa, xb in zip(ca, cb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb))


def test_sharded_update_matches_unsharded():
    mesh = get_mesh(8)
    buf = _filled_buffer()
    sbuf = shard_buffer(buf, mesh)
    key = jax.random.PRNGKey(3)
    x = jnp.ones((8, 32, 32, 3))
    y = jnp.full((8,), 5, jnp.int32)
    with mesh:
        a, ra = jax.jit(reservoir_update)(buf, x, y, key)
        b, rb = jax.jit(reservoir_update)(sbuf, x, y, key)
    np.testing.assert_allclose(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb))
    np.testing.assert_allclose(np.asarray(a.class_counts), np.asarray(b.class_counts))
