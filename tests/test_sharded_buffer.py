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


def test_sharded_ncm_eval_matches_unsharded():
    """The NCM eval path (SCR/iCaRL's classifier; the O(T^2) eval hot spot,
    SURVEY.md 3.2) fans out over the mesh with --n_devices: the exemplar
    feature sweep shards its chunk rows, test batches shard like the softmax
    path. Sharding is placement only — means agree to reduction-order
    tolerance and the per-task accuracies are identical."""
    from ocl_tpu.buffer.state import valid_mask
    from ocl_tpu.config import default_params
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.models import feature_dim_for
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", ncm_trick=True,
                       mem_size=64, eps_mem_batch=8, nf=4, verbose=False,
                       test_batch=16)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    for t in range(2):
        x = g.rand(40, 32, 32, 3).astype(np.float32)
        y = g.randint(t * 2, t * 2 + 2, 40)
        state = agent.train_learner(state, x, y)
    tests = [(g.rand(32, 32, 32, 3).astype(np.float32),
              g.randint(t * 2, t * 2 + 2, 32)) for t in range(2)]
    loaders = prepare_test_loaders(tests, p)

    accs_unsharded = agent.evaluate(state, loaders)
    agent.params.n_devices = 8
    with get_mesh(8):
        accs_sharded = agent.evaluate(state, loaders)
    assert ("ncm", 8) in agent._eval_cache  # the sharded program really built
    np.testing.assert_array_equal(accs_unsharded, accs_sharded)

    # the exemplar means themselves: reduction-order tolerance
    noise = jnp.zeros((agent.n_classes,
                       feature_dim_for("synthetic", 4)), jnp.float32)
    buf = state.buffer
    m_un = agent._eval_cache[("ncm", 1)][0](
        state.params, state.batch_stats, buf.imgs, buf.labels,
        valid_mask(buf), noise)
    with get_mesh(8):
        m_sh = agent._eval_cache[("ncm", 8)][0](
            state.params, state.batch_stats, buf.imgs, buf.labels,
            valid_mask(buf), noise)
    np.testing.assert_allclose(np.asarray(m_un), np.asarray(m_sh),
                               rtol=1e-5, atol=1e-6)
