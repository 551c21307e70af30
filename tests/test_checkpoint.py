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
