"""Checkpoint/resume: a run interrupted mid-stream resumes identically."""

import tempfile

import jax
import numpy as np

from ocl_tpu.config import default_params
from ocl_tpu.registry import agents
from ocl_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_agent_meta,
    save_checkpoint,
    snapshot_agent_meta,
)


def test_save_restore_roundtrip():
    p = default_params(data="synthetic", agent="ER", mem_size=60, verbose=False, nf=4)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    x1, y1 = g.rand(40, 32, 32, 3).astype(np.float32), g.randint(0, 2, 40)
    x2, y2 = g.rand(40, 32, 32, 3).astype(np.float32), g.randint(2, 4, 40)

    state = agent.train_learner(state, x1, y1)
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, state, snapshot_agent_meta(agent))

        # fresh agent + state restored from disk
        agent2 = agents["ER"](p)
        target = agent2.init_state(jax.random.PRNGKey(0))
        state2, meta = load_checkpoint(d, target)
        restore_agent_meta(agent2, meta)

    assert agent2.task_seen == 1
    assert agent2.old_labels == agent.old_labels
    np.testing.assert_allclose(
        np.asarray(state2.buffer.labels), np.asarray(state.buffer.labels))

    # both continue the stream; trajectories stay identical
    s_a = agent.train_learner(state, x2, y2)
    s_b = agent2.train_learner(state2, x2, y2)
    la = np.asarray(s_a.params["linear"]["Dense_0"]["kernel"])
    lb = np.asarray(s_b.params["linear"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-6)


def test_cndpm_checkpoint_roundtrip():
    """CN-DPM state (stacked expert slots, STM, CRP prior, sched_t) survives
    a save/restore and resumes training."""
    import ocl_tpu.models.ndpm_vars as V

    old_z = V.VAE_Z_SAMPLES
    V.VAE_Z_SAMPLES = 2
    try:
        p = default_params(data="synthetic", agent="CNDPM", max_experts=2,
                           stm_capacity=20, batch=10, verbose=False,
                           optimizer="Adam", learning_rate=0.001)
        p.sleep_step_g = 2
        p.sleep_step_d = 2
        agent = agents["CNDPM"](p)
        state = agent.init_state(jax.random.PRNGKey(0))
        g = np.random.RandomState(0)
        x = g.rand(30, 32, 32, 3).astype(np.float32)
        y = g.randint(0, 2, 30)
        state = agent.train_learner(state, x, y)
        assert int(state.agent["active"]) >= 1

        with tempfile.TemporaryDirectory() as d:
            save_checkpoint(d, state, snapshot_agent_meta(agent))
            agent2 = agents["CNDPM"](p)
            state2 = agent2.init_state(jax.random.PRNGKey(1))
            restored, meta = load_checkpoint(d, state2)
            restore_agent_meta(agent2, meta)

        np.testing.assert_array_equal(np.asarray(restored.agent["sched_t"]),
                                      np.asarray(state.agent["sched_t"]))
        np.testing.assert_array_equal(np.asarray(restored.agent["log_counts"]),
                                      np.asarray(state.agent["log_counts"]))
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumes training from the restored state
        x2 = g.rand(20, 32, 32, 3).astype(np.float32)
        y2 = g.randint(2, 4, 20)
        restored = agent2.train_learner(restored, x2, y2)
        assert np.isfinite(np.asarray(
            jax.tree_util.tree_leaves(restored.params["vae"])[0])).all()
    finally:
        V.VAE_Z_SAMPLES = old_z
