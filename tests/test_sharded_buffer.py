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


def test_sharded_aser_scoring_matches_unsharded():
    """ASER's KNN-SV scoring (class-balanced candidates, Pallas/jnp distance
    matrix, Shapley recursion) is a pure fn of the buffer — slot-sharding is
    placement only and must not change the retrieved set (SURVEY 5.7: score
    computations shard with the memory bank)."""
    from ocl_tpu.buffer import build_retrieve
    from ocl_tpu.config import default_params
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", retrieve="ASER",
                       update="ASER", mem_size=64, eps_mem_batch=8,
                       k=3, n_smp_cls=2.0, nf=4, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    retrieve = build_retrieve(agent)

    mesh = get_mesh(8)
    buf = _filled_buffer()
    # force the SV path (n_seen > mem_size)
    buf = buf.replace(n_seen_so_far=jnp.asarray(1000, jnp.int32))
    sbuf = shard_buffer(buf, mesh)

    g = np.random.RandomState(0)
    x = jnp.asarray(g.rand(8, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 10, 8), jnp.int32)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    key = jax.random.PRNGKey(11)

    def run(b):
        return retrieve(state.params, state.batch_stats, b, x, y, zeros, key)

    with mesh:
        a = jax.jit(run)(buf)
        b = jax.jit(run)(sbuf)
    for xa, xb in zip(a[:3], b[:3]):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-5, atol=1e-5)


def test_sharded_gss_update_matches_unsharded():
    """GSS per-sample-gradient update (cosine vs the buffer's gradient bank)
    under the slot-sharded buffer == unsharded, bit-compatibly."""
    from ocl_tpu.buffer import build_update
    from ocl_tpu.config import default_params
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", update="GSS",
                       mem_size=64, eps_mem_batch=8, gss_mem_strength=3,
                       gss_batch_size=8, nf=4, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    update = build_update(agent)

    mesh = get_mesh(8)
    buf = _filled_buffer()
    sbuf = shard_buffer(buf, mesh)
    g = np.random.RandomState(1)
    x = jnp.asarray(g.rand(8, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 10, 8), jnp.int32)
    key = jax.random.PRNGKey(5)

    def run(b):
        return update(state.params, state.batch_stats, b, x, y, key)

    with mesh:
        a, _ = jax.jit(run)(buf)
        b, _ = jax.jit(run)(sbuf)
    np.testing.assert_allclose(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                               rtol=1e-5, atol=1e-6)
