"""Per-agent smoke tests: every registered agent trains a 2-task stream and
evaluates, exercising its full jitted step (nf=4 to bound CPU compile time)."""

import jax
import numpy as np
import pytest

from ocl_tpu.config import default_params
from ocl_tpu.data import prepare_test_loaders
from ocl_tpu.registry import agents


def _stream(p, n_tasks=2, per_task=40):
    g = np.random.RandomState(0)
    tasks = []
    for t in range(n_tasks):
        x = g.rand(per_task, 32, 32, 3).astype(np.float32)
        y = g.randint(t * 2, t * 2 + 2, per_task)
        tasks.append((x, y))
    test = [(g.rand(20, 32, 32, 3).astype(np.float32), g.randint(t * 2, t * 2 + 2, 20))
            for t in range(n_tasks)]
    return tasks, prepare_test_loaders(test, p)


@pytest.mark.parametrize("name,extra", [
    ("LWF", {}),
    ("EWC", {"fisher_update_after": 3}),
    ("AGEM", {}),
    ("ICARL", {}),
    ("GDUMB", {"mem_epoch": 2, "mem_size": 40}),
    ("SCR", {"eps_mem_batch": 10, "head": "mlp"}),
    ("SCR", {"eps_mem_batch": 10, "review_trick": True}),
    ("ER", {"mem_size": 0, "eps_mem_batch": 0}),
    ("ER", {"labels_trick": True}),
    ("ER", {"separated_softmax": True}),
    ("ER", {"kd_trick": True}),
    ("ER", {"kd_trick_star": True}),
    ("ER", {"review_trick": True}),
    ("ER", {"ncm_trick": True}),
])
def test_agent_trains_and_evaluates(name, extra):
    kw = dict(data="synthetic", agent=name, mem_size=60, verbose=False,
              nf=4, test_batch=20)
    kw.update(extra)
    p = default_params(**kw)
    agent = agents[name](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    tasks, loaders = _stream(p)
    for x, y in tasks:
        state = agent.train_learner(state, x, y)
    accs = agent.evaluate(state, loaders)
    assert accs.shape == (2,)
    assert np.all(accs >= 0) and np.all(accs <= 1)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])).all()


def test_scr_fused_views_match_sequential_loss():
    """The fused two-view forward (one 2N-row pass) computes the same
    objective as the sequential two-pass up to BN normalization coupling:
    each view is normalized by the combined batch's statistics instead of
    its own. The losses differ by that coupling only — same ballpark, both
    finite (end-metric agreement is pinned by the SCR_FUSED parity row)."""
    import jax
    import jax.numpy as jnp

    from ocl_tpu.config import default_params
    from ocl_tpu.registry import agents

    losses = {}
    for fused in (False, True):
        p = default_params(data="synthetic", agent="SCR", mem_size=100,
                           batch=10, eps_mem_batch=10, nf=4, verbose=False,
                           fused_replay=fused)
        agent = agents["SCR"](p)
        state = agent.init_state(jax.random.PRNGKey(0))
        loss, _ = agent._two_view_loss(
            state.params, state.batch_stats,
            jnp.ones((10, 32, 32, 3), jnp.float32) * 0.5,
            jnp.arange(10) % 4, None, jax.random.PRNGKey(1))
        losses[fused] = float(loss)
    import numpy as np

    assert np.isfinite(losses[True]) and np.isfinite(losses[False])
    assert abs(losses[True] - losses[False]) < 0.5, losses


def test_error_analysis_eval_prints_and_accumulates(capsys, tmp_path,
                                                    monkeypatch):
    """--error_analysis eval matches the reference's console surface
    (agents/base.py:212-226): per eval it appends to all seven accumulators
    (error_list, new/old_class_score, fc/bias norms — unconditionally, NaN
    for empty class sets) and prints the nine lines in the reference's
    order."""
    monkeypatch.chdir(tmp_path)  # the eval dumps a 'confusion' pickle to cwd
    p = default_params(data="synthetic", agent="ER", mem_size=60,
                       verbose=True, nf=4, test_batch=20,
                       error_analysis=True)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    tasks, loaders = _stream(p)
    n_evals = 0
    for x, y in tasks:
        state = agent.train_learner(state, x, y)
        capsys.readouterr()
        accs = agent.evaluate(state, loaders)
        n_evals += 1
        out = capsys.readouterr().out.strip().splitlines()
        # accs, "no ratio"+"on ratio" (2 lines), error_list, new/old score,
        # fc old/new, bias old/new — the ratio format splits over 2 lines
        assert len(out) >= 10, out
        assert out[-9].startswith("no ratio"), out
        assert accs.shape == (2,)
    assert len(agent.error_list) == n_evals
    for lst in (agent.new_class_score, agent.old_class_score,
                agent.fc_norm_new, agent.fc_norm_old,
                agent.bias_norm_new, agent.bias_norm_old):
        assert len(lst) == n_evals, lst
    # after task 1 there are no old-minus-zombie classes: NaN, like the
    # reference's mean over an empty tensor
    assert np.isnan(agent.fc_norm_old[0]) and np.isfinite(agent.fc_norm_old[1])
    assert (tmp_path / "confusion").exists()
