"""Smoke tests: each retrieve/update strategy trains inside the jitted ER step.

Narrow backbone (nf=4) + short streams keep CPU compile time bounded; these
validate shapes/masks/cond paths, not accuracy (test_e2e covers learning).
"""

import jax
import numpy as np
import pytest

from ocl_tpu.config import default_params
from ocl_tpu.registry import agents


def _run_two_tasks(p):
    agent = agents[p.agent](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    for task in range(2):
        x = g.rand(60, 32, 32, 3).astype(np.float32)
        y = g.randint(task * 2, task * 2 + 2, 60)
        state = agent.train_learner(state, x, y)
    assert int(state.buffer.current_index) > 0
    assert np.isfinite(np.asarray(state.params["linear"]["Dense_0"]["kernel"])).all()
    return agent, state


@pytest.mark.parametrize("retrieve,update", [
    ("MIR", "random"),
    ("random", "GSS"),
    ("ASER", "ASER"),
    ("match", "random"),
    ("mem_match", "random"),
])
def test_strategy_combo_trains(retrieve, update):
    p = default_params(data="synthetic", agent="ER", retrieve=retrieve, update=update,
                       mem_size=80, eps_mem_batch=10, subsample=20, verbose=False,
                       nf=4, gss_mem_strength=3, gss_batch_size=10, k=3,
                       n_smp_cls=2.0, warmup=1)
    _run_two_tasks(p)


def test_gss_scores_populated():
    p = default_params(data="synthetic", agent="ER", update="GSS", mem_size=40,
                       eps_mem_batch=10, verbose=False, nf=4,
                       gss_mem_strength=2, gss_batch_size=10)
    _, state = _run_two_tasks(p)
    # first batch scores 0.1, later fills carry real cosine scores
    scores = np.asarray(state.buffer.score[: int(state.buffer.current_index)])
    assert np.isfinite(scores).all()
    assert (np.abs(scores) <= 1.0 + 1e-5).all()


def test_gss_jvp_gate_matches_materialized_bank():
    """The replace gate uses jvp dot products instead of materializing the
    gradient bank; each dot must equal <bank_i, batch_grad> and the gate
    sign must match the reference's max-cosine sign
    (reference gss_greedy_update.py:25,65-80)."""
    import jax.numpy as jnp

    from ocl_tpu.buffer.gss import _cosine_rows, build_gss_update

    p = default_params(data="synthetic", agent="ER", update="GSS", mem_size=40,
                       eps_mem_batch=10, verbose=False, nf=4,
                       gss_mem_strength=3, gss_batch_size=10)
    agent = agents[p.agent](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    upd = build_gss_update(agent)

    g = np.random.RandomState(1)
    x = jnp.asarray(g.rand(10, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 4, 10), jnp.int32)
    # fill the buffer so bank batches are fully valid
    buf = state.buffer
    for i in range(4):
        buf, _ = upd(state.params, state.batch_stats, buf,
                     jnp.asarray(g.rand(10, 32, 32, 3), jnp.float32),
                     jnp.asarray(g.randint(0, 4, 10), jnp.int32),
                     jax.random.PRNGKey(i))

    r_bank = jax.random.PRNGKey(99)
    xs, ys, ms, row_valid = upd.sample_bank_batches(buf, r_bank)
    bgrad_tree = jax.grad(upd.ce_eval)(state.params, state.batch_stats, x, y)
    dots = np.asarray(upd.bank_dots(state.params, state.batch_stats,
                                    xs, ys, ms, bgrad_tree))
    bank = np.asarray(upd.mem_grad_bank(state.params, state.batch_stats,
                                        xs, ys, ms))
    bflat = np.asarray(upd.flat_grad(state.params, state.batch_stats, x, y))
    explicit = bank @ bflat
    np.testing.assert_allclose(dots, explicit, rtol=2e-3, atol=1e-6)
    cos_max = float(np.max(np.asarray(
        _cosine_rows(jnp.asarray(bank), jnp.asarray(bflat)[None, :])[:, 0])))
    assert (float(np.max(dots)) < 0) == (cos_max < 0)


def test_aser_update_keeps_buffer_consistent():
    p = default_params(data="synthetic", agent="ER", retrieve="ASER", update="ASER",
                       mem_size=40, eps_mem_batch=10, verbose=False, nf=4,
                       k=3, n_smp_cls=1.0)
    _, state = _run_two_tasks(p)
    buf = state.buffer
    assert int(buf.current_index) == 40
    labels = np.asarray(buf.labels)
    counts = np.asarray(buf.class_counts)
    for c in range(10):
        assert counts[c] == (labels == c).sum()
    assert int(buf.n_seen_so_far) == 120


def test_mir_retrieve_folds_bn_stats():
    """MIR's pre-scoring forward mutates the live running stats (reference
    mir_retrieve.py:23-27 runs train-mode no_grad forwards on the model);
    the retrieve contract returns the folded stats."""
    import jax.numpy as jnp

    from ocl_tpu.buffer import build_retrieve
    from ocl_tpu.buffer.reservoir import reservoir_update

    p = default_params(data="synthetic", agent="ER", retrieve="MIR",
                       mem_size=40, eps_mem_batch=5, subsample=10,
                       verbose=False, nf=4)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    retrieve = build_retrieve(agent)
    g = np.random.RandomState(0)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    # empty buffer: stats pass through unchanged
    _, _, mask0, st0 = retrieve(state.params, state.batch_stats, state.buffer,
                                None, None, zeros, jax.random.PRNGKey(1))
    assert not bool(np.any(np.asarray(mask0)))
    np.testing.assert_array_equal(np.asarray(st0["bn1"]["mean"]),
                                  np.asarray(state.batch_stats["bn1"]["mean"]))

    # filled buffer: the pre forward folds subsample stats
    x = jnp.asarray(g.rand(20, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 4, 20), jnp.int32)
    buf, _ = reservoir_update(state.buffer, x, y, jax.random.PRNGKey(2))
    _, _, mask1, st1 = retrieve(state.params, state.batch_stats, buf,
                                None, None, zeros, jax.random.PRNGKey(3))
    assert bool(np.any(np.asarray(mask1)))
    assert np.abs(np.asarray(st1["bn1"]["mean"]) -
                  np.asarray(state.batch_stats["bn1"]["mean"])).max() > 0
