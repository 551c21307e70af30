"""CN-DPM smoke test: routing fills the STM, sleep births an expert, the
mixture predicts. Tiny K/capacity/sleep budgets + reduced z-samples keep the
CPU compile bounded (the full graph is exercised identically)."""

import jax
import numpy as np
import pytest

import ocl_tpu.models.ndpm_vars as V
from ocl_tpu.config import default_params
from ocl_tpu.data import prepare_test_loaders
from ocl_tpu.registry import agents


@pytest.fixture
def small_z_samples():
    orig = V.VAE_Z_SAMPLES
    V.VAE_Z_SAMPLES = 2
    yield
    V.VAE_Z_SAMPLES = orig


def test_cndpm_end_to_end(small_z_samples):
    p = default_params(data="synthetic", agent="CNDPM", max_experts=2,
                       stm_capacity=30, batch=10, verbose=False, test_batch=20,
                       optimizer="Adam", learning_rate=0.001,
                       classifier_chill=0.01, log_alpha=-300)
    p.sleep_step_g = 5
    p.sleep_step_d = 5
    agent = agents["CNDPM"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    for task in range(2):
        x = g.rand(40, 32, 32, 3).astype(np.float32)
        y = g.randint(task * 2, task * 2 + 2, 40)
        state = agent.train_learner(state, x, y)

    # the first 30 streamed samples fill the STM (no experts yet) -> sleep
    assert int(state.agent["active"]) >= 1
    lc = np.asarray(state.agent["log_counts"])
    assert np.isfinite(lc[1: 1 + int(state.agent["active"])]).all()

    test = [(g.rand(20, 32, 32, 3).astype(np.float32), g.randint(0, 4, 20))]
    accs = agent.evaluate(state, prepare_test_loaders(test, p))
    assert accs.shape == (1,)
    assert 0 <= accs[0] <= 1
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.params["vae"])[0])).all()
