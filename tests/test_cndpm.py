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


def test_multistep_lr_matches_torch():
    """multistep_lr == torch MultiStepLR (reference component.py:53-55) for
    the reference config and for multi-milestone variants."""
    import torch

    from ocl_tpu.agents.cndpm import multistep_lr

    for milestones, gamma in [((1,), 0.2), ((1, 3), 0.5), ((2, 4, 6), 0.1)]:
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.1)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(milestones), gamma=gamma)
        torch_lrs = []
        for _ in range(8):
            torch_lrs.append(opt.param_groups[0]["lr"])
            sched.step()
        got = multistep_lr(0.1, np.arange(8, dtype=np.int32),
                           milestones=milestones, gamma=gamma)
        np.testing.assert_allclose(np.asarray(got), torch_lrs, rtol=1e-6)


def test_cndpm_scheduler_counters(small_z_samples):
    """Newborn experts cross milestone 1 at sleep end (two scheduler steps,
    reference ndpm.py:184-185) and each wake update steps the counter."""
    p = default_params(data="synthetic", agent="CNDPM", max_experts=2,
                       stm_capacity=30, batch=10, verbose=False,
                       optimizer="Adam", learning_rate=0.001)
    p.sleep_step_g = 2
    p.sleep_step_d = 2
    agent = agents["CNDPM"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(1)
    x = g.rand(40, 32, 32, 3).astype(np.float32)
    y = g.randint(0, 2, 40)
    state = agent.train_learner(state, x, y)
    active = int(state.agent["active"])
    sched_t = np.asarray(state.agent["sched_t"])
    assert active >= 1
    # every born expert was stepped twice at its sleep (+ any wake steps)
    assert (sched_t[:active] >= 2).all()
    # unborn slots never stepped
    assert (sched_t[active:] == 0).all()


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
