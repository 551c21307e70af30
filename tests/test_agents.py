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


def test_scr_review_dead_forward_folds_stats_only():
    """--scr_review_dead_forward reproduces the reference review step's
    dead forward (reference agents/base.py:77): loss and grads are
    BIT-IDENTICAL with and without it (train-mode forwards never read
    running stats), and the returned batch_stats equal pre-folding one
    extra forward_train of the identity batch before the two-view loss
    ([id, id, aug] vs [id, aug])."""
    import jax
    import jax.numpy as jnp

    from ocl_tpu.config import default_params
    from ocl_tpu.models import forward_train
    from ocl_tpu.registry import agents

    xb = jnp.ones((8, 32, 32, 3), jnp.float32) * 0.5
    yb = jnp.arange(8) % 4
    rng = jax.random.PRNGKey(1)
    out = {}
    for dead in (False, True):
        p = default_params(data="synthetic", agent="SCR", mem_size=50,
                           batch=8, eps_mem_batch=8, nf=4, verbose=False,
                           review_trick=True, scr_review_dead_forward=dead)
        agent = agents["SCR"](p)
        state = agent.init_state(jax.random.PRNGKey(0))
        out[dead] = (agent.review_loss(state.params, state.batch_stats,
                                       xb, yb, None, rng),
                     agent, state)
    (loss0, grads0, st0), _, _ = out[False]
    (loss1, grads1, st1), agent, state = out[True]
    assert float(loss0) == float(loss1)
    for g0, g1 in zip(jax.tree_util.tree_leaves(grads0),
                      jax.tree_util.tree_leaves(grads1)):
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    # stats differ, and equal the manual pre-fold composition
    _, prefolded = forward_train(agent.module, state.params,
                                 state.batch_stats, xb)
    (_, _, st_manual) = out[False][1].review_loss(
        state.params, prefolded, xb, yb, None, rng)
    for a, b in zip(jax.tree_util.tree_leaves(st1),
                    jax.tree_util.tree_leaves(st_manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree_util.tree_leaves(st0),
                                  jax.tree_util.tree_leaves(st1)))
    assert changed, "dead forward should move the BN running stats"


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
