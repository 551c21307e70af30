"""--ckpt_dir crash-resume through the runner: an interrupted experiment
resumes mid-stream and ends with exactly the uninterrupted result."""

import tempfile

import numpy as np
import pytest

import ocl_tpu.experiment.run as run_mod
from ocl_tpu.config import default_params
from ocl_tpu.experiment.run import multiple_run


def _params(**kw):
    base = dict(data="synthetic", num_runs=1, num_tasks=3, mem_size=100,
                synthetic_size=40, nf=4, test_batch=32, verbose=False,
                fix_order=True)
    base.update(kw)
    return default_params(**base)


def test_interrupt_and_resume_matches_uninterrupted(monkeypatch):
    baseline = multiple_run(_params())

    with tempfile.TemporaryDirectory() as ckpt:
        # interrupt after the second task's checkpoint
        orig = run_mod._new_agent_and_state
        calls = {"n": 0}

        def wrapped(params, seed):
            agent, state = orig(params, seed)
            real = agent.train_learner

            def counting(state, x, y):
                calls["n"] += 1
                if calls["n"] == 3:
                    raise KeyboardInterrupt("simulated crash in task 3")
                return real(state, x, y)

            agent.train_learner = counting
            return agent, state

        monkeypatch.setattr(run_mod, "_new_agent_and_state", wrapped)
        with pytest.raises(KeyboardInterrupt):
            multiple_run(_params(ckpt_dir=ckpt))
        monkeypatch.setattr(run_mod, "_new_agent_and_state", orig)

        resumed = multiple_run(_params(ckpt_dir=ckpt))

    np.testing.assert_allclose(resumed[0][0], baseline[0][0], rtol=1e-5)
    np.testing.assert_allclose(resumed[1][0], baseline[1][0], atol=1e-6)
