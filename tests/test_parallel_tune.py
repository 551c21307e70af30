"""Grid-parallel tuning (experiment/parallel_tune.py) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocl_tpu.config import default_params
from ocl_tpu.optim import setup_opt


def test_injected_hyperparams_vary_per_vmapped_point():
    """Stacked opt_states carry different lrs through one vmapped update."""
    tx = setup_opt("SGD", 0.1, 0.0, inject=True)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}

    def one_step(lr):
        opt = tx.init(params)
        opt.hyperparams["learning_rate"] = lr
        updates, _ = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates)

    out = jax.vmap(one_step)(jnp.asarray([0.1, 0.5]))
    np.testing.assert_allclose(np.asarray(out["w"][0]), 1 - 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["w"][1]), 1 - 0.5, rtol=1e-6)


def test_injected_chain_matches_static():
    """inject=True SGD+wd == static chain numerically."""
    params = {"w": jnp.full((4,), 2.0)}
    grads = {"w": jnp.full((4,), 0.5)}
    for opt_name in ("SGD", "Adam"):
        tx_s = setup_opt(opt_name, 0.03, 0.01)
        tx_i = setup_opt(opt_name, 0.03, 0.01, inject=True)
        u_s, _ = tx_s.update(grads, tx_s.init(params), params)
        u_i, _ = tx_i.update(grads, tx_i.init(params), params)
        np.testing.assert_allclose(np.asarray(u_i["w"]), np.asarray(u_s["w"]),
                                   rtol=1e-6)


def _tiny_stream(n_tasks=2, per_task=40, n_cls=10, seed=0):
    g = np.random.RandomState(seed)
    tasks = []
    for t in range(n_tasks):
        x = g.rand(per_task, 32, 32, 3).astype(np.float32)
        y = g.randint(t * 2, t * 2 + 2, per_task)
        tasks.append((x, y, None))
    return tasks


def test_tune_hyper_parallel_selects_grid_point():
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.experiment.tune import _merged, parameter_grid, tune_hyper

    p = default_params(data="synthetic", agent="ER", mem_size=100, batch=10,
                       eps_mem_batch=10, nf=4, verbose=False, num_runs_val=1,
                       parallel_runs=True, test_batch=20)
    tune_params = {"learning_rate": [0.01, 0.1]}
    tasks = _tiny_stream()
    g = np.random.RandomState(1)
    tests = [(g.rand(20, 32, 32, 3).astype(np.float32),
              g.randint(0, 4, 20)) for _ in range(2)]
    loaders = prepare_test_loaders(tests, p)

    assert len(jax.devices()) >= 2  # conftest forces the 8-device CPU mesh
    best = tune_hyper(tasks, loaders, p, tune_params)
    assert best in parameter_grid(tune_params)


def test_stacked_task_fn_honors_per_point_lr():
    """lr injection through the FULL stacked task fn: an lr-0 point must stay
    bit-identical to init while an lr-0.1 point moves (guards against any
    future step-path change that silently re-bakes agent0's lr for every
    stacked point)."""
    from ocl_tpu.agents.base import TaskCtx
    from ocl_tpu.experiment.parallel_run import _stack
    from ocl_tpu.experiment.tune import _merged
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", mem_size=20, batch=4,
                       eps_mem_batch=4, nf=4, verbose=False, num_runs_val=1)
    ags = [agents["ER"](_merged(p, {"learning_rate": lr, "inject_hp": True}))
           for lr in (0.0, 0.1)]
    a0 = ags[0]
    s = a0.init_state(jax.random.PRNGKey(1000))
    stacked = _stack([s.replace(opt_state=a.tx.init(s.params)) for a in ags])
    task_fn = jax.jit(jax.vmap(a0._build_train_task_fn(),
                               in_axes=(0, None, None, None)))
    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(4, 4, 32, 32, 3).astype(np.float32))
    ys = jnp.asarray(g.randint(0, 2, (4, 4)))
    ctx = TaskCtx(old_mask=jnp.zeros(10, bool),
                  new_mask=jnp.asarray([True] * 2 + [False] * 8),
                  task_seen=jnp.asarray(0, jnp.int32))
    out, _ = task_fn(stacked, ctx, xs, ys)
    deltas = [
        sum(float(jnp.abs(a[i] - b).sum())
            for a, b in zip(jax.tree_util.tree_leaves(out.params),
                            jax.tree_util.tree_leaves(s.params)))
        for i in range(2)
    ]
    assert deltas[0] == 0.0  # lr=0 point: bit-identical to init
    assert deltas[1] > 1.0   # lr=0.1 point: trained


def test_supports_parallel_grid_gating():
    import ocl_tpu.experiment.parallel_tune as pt
    from ocl_tpu.experiment.parallel_tune import supports_parallel_grid

    p = default_params(data="synthetic", agent="ER", retrieve="MIR")
    # MIR + lr grid: virtual step lr is baked per-agent -> must fall back
    assert not supports_parallel_grid(p, {"learning_rate": [0.01, 0.1]})
    p2 = default_params(data="synthetic", agent="ER")
    assert not supports_parallel_grid(p2, {"subsample": [10, 50]})
    assert supports_parallel_grid(
        p2, {"learning_rate": [0.01, 0.1], "weight_decay": [0.0, 0.01]})
    # iCaRL/GDumb reference grids vary exactly lr/wd -> capable
    assert supports_parallel_grid(
        default_params(data="synthetic", agent="ICARL"),
        {"learning_rate": [0.01, 0.1]})
    assert supports_parallel_grid(
        default_params(data="synthetic", agent="GDUMB"),
        {"learning_rate": [0.01, 0.1]})
    # the gate is a MEMORY bound: a grid whose stacked states exceed the
    # budget falls back (buffers dominate the per-point footprint)
    big = default_params(data="synthetic", agent="ER", mem_size=10000,
                         num_runs_val=10)
    grid = {"learning_rate": [0.1] * 7, "weight_decay": [0.0] * 4}
    est = pt._stack_bytes_estimate(big, 7 * 4 * 10)
    assert (est > pt.STACK_BYTES_BUDGET) == (
        not supports_parallel_grid(big, grid))


def test_tune_hyper_parallel_icarl_ncm():
    """iCaRL lr grids run stacked, evaluated through the vmapped NCM path."""
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.experiment.tune import parameter_grid, tune_hyper

    p = default_params(data="synthetic", agent="ICARL", mem_size=100,
                       batch=10, eps_mem_batch=10, nf=4, verbose=False,
                       num_runs_val=1, parallel_runs=True, test_batch=20)
    tune_params = {"learning_rate": [0.02, 0.1]}
    tasks = _tiny_stream()
    g = np.random.RandomState(3)
    tests = [(g.rand(20, 32, 32, 3).astype(np.float32),
              g.randint(0, 4, 20)) for _ in range(2)]
    loaders = prepare_test_loaders(tests, p)
    best = tune_hyper(tasks, loaders, p, tune_params)
    assert best in parameter_grid(tune_params)


def test_stacked_ncm_eval_matches_sequential():
    """A 1-point stacked NCM eval == the sequential _evaluate_ncm on the
    same trained state (same fold_in(rng, 7) noise for empty classes)."""
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.experiment.parallel_run import _stack
    from ocl_tpu.experiment.parallel_tune import _make_stacked_ncm
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ICARL", mem_size=60,
                       batch=10, eps_mem_batch=10, nf=4, verbose=False,
                       test_batch=20)
    agent = agents["ICARL"](p)
    state = agent.init_state(jax.random.PRNGKey(7))
    tasks = _tiny_stream(n_tasks=1, per_task=40)
    state = agent.train_learner(state, tasks[0][0], tasks[0][1])
    g = np.random.RandomState(4)
    tests = [(g.rand(20, 32, 32, 3).astype(np.float32),
              g.randint(0, 4, 20)) for _ in range(2)]
    loaders = prepare_test_loaders(tests, p)
    want = agent.evaluate(state, loaders)

    means_fn, classify_fn = _make_stacked_ncm(agent)
    stacked = _stack([state])
    seen = np.zeros(agent.n_classes, bool)
    seen[agent.old_labels] = True
    means = means_fn(stacked)
    got = []
    for x, y, m in loaders:
        c = np.asarray(classify_fn(stacked, means, jnp.asarray(seen),
                                   x, y, m))[0]
        got.append(c / max(int(np.sum(np.asarray(m))), 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_tune_hyper_parallel_gdumb():
    """GDumb lr grids run stacked: shared balanced memory, vmapped per-point
    retrain with injected lr/wd."""
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.experiment.tune import parameter_grid, tune_hyper

    p = default_params(data="synthetic", agent="GDUMB", mem_size=60,
                       batch=10, mem_epoch=2, clip=10.0, nf=4, verbose=False,
                       num_runs_val=1, parallel_runs=True, test_batch=20)
    tune_params = {"learning_rate": [0.02, 0.1]}
    tasks = _tiny_stream()
    g = np.random.RandomState(5)
    tests = [(g.rand(20, 32, 32, 3).astype(np.float32),
              g.randint(0, 4, 20)) for _ in range(2)]
    loaders = prepare_test_loaders(tests, p)
    best = tune_hyper(tasks, loaders, p, tune_params)
    assert best in parameter_grid(tune_params)


def test_gdumb_stacked_per_point_lr_and_init():
    """Per-point lr injection through the stacked GDumb retrain: an lr=0
    point's params stay bit-identical to ITS own fresh re-init (the retrain
    never moves them; rounding-immune even under vmapped convs), while an
    lr=0.5 point trains away from the same init. Also pins the per-point rng
    schedule: the lr=0 point's init must equal init_model on the third
    split of its state rng — exactly the sequential train_task's split."""
    from ocl_tpu.agents.base import TaskCtx
    from ocl_tpu.experiment.parallel_run import _stack
    from ocl_tpu.experiment.tune import _merged
    from ocl_tpu.models import init_model
    from ocl_tpu.registry import agents

    base = default_params(data="synthetic", agent="GDUMB", mem_size=200,
                          batch=5, mem_epoch=2, clip=10.0, weight_decay=0.0,
                          nf=4, verbose=False)
    g = np.random.RandomState(6)
    x = g.rand(30, 32, 32, 3).astype(np.float32)
    y = g.randint(0, 2, 30)
    ctx = TaskCtx(old_mask=jnp.zeros(10, bool),
                  new_mask=jnp.asarray([True] * 2 + [False] * 8),
                  task_seen=jnp.asarray(0, jnp.int32))

    ags = [agents["GDUMB"](_merged(base, {"learning_rate": lr,
                                          "inject_hp": True}))
           for lr in (0.0, 0.5)]
    a0 = ags[0]
    s0 = a0.init_state(jax.random.PRNGKey(42))
    stacked = _stack([s0.replace(opt_state=a.tx.init(s0.params))
                      for a in ags])
    out = a0.stacked_train_task(stacked, ctx, x, y)

    # the sequential train_task's rng schedule: 3-way split, third = init
    want_init, _ = init_model(a0.module, jax.random.split(s0.rng, 3)[2],
                              a0.data)
    for a, b in zip(jax.tree_util.tree_leaves(out.params),
                    jax.tree_util.tree_leaves(want_init)):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b))
    # and the lr=0.5 point genuinely trained away from the shared init
    delta = sum(float(jnp.abs(a[1] - a[0]).sum())
                for a in jax.tree_util.tree_leaves(out.params))
    assert delta > 1.0


def test_tune_hyper_parallel_ewc():
    """EWC lr grids use the stacked-safe fisher hooks (per-point min-max)."""
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.experiment.tune import parameter_grid, tune_hyper

    p = default_params(data="synthetic", agent="EWC", lambda_=100.0,
                       alpha=0.9, fisher_update_after=10, nf=4,
                       verbose=False, num_runs_val=1, parallel_runs=True,
                       test_batch=20, batch=10)
    tune_params = {"learning_rate": [0.02, 0.1]}
    tasks = _tiny_stream()
    g = np.random.RandomState(2)
    tests = [(g.rand(20, 32, 32, 3).astype(np.float32),
              g.randint(0, 4, 20)) for _ in range(2)]
    loaders = prepare_test_loaders(tests, p)
    best = tune_hyper(tasks, loaders, p, tune_params)
    assert best in parameter_grid(tune_params)


def test_ewc_stacked_normalize_matches_per_point():
    """after_train_stacked's per-point min-max == running each point through
    the unstacked after_train normalization."""
    import jax.numpy as jnp

    from ocl_tpu.experiment.parallel_run import _stack

    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="EWC", nf=4, verbose=False)
    agent = agents["EWC"](p)
    states = [agent.init_state(jax.random.PRNGKey(i)) for i in range(2)]
    # distinct fake fishers per point
    for i, s in enumerate(states):
        ag = dict(s.agent)
        ag["running_fisher"] = jax.tree_util.tree_map(
            lambda a: jnp.abs(a) * (i + 1) + i, s.agent["running_fisher"])
        states[i] = s.replace(agent=ag)

    class _Ctx:
        pass

    ctx = None
    stacked = _stack(states)
    out_stacked = agent.after_train_stacked(stacked, ctx)
    for i in range(2):
        agent2 = agents["EWC"](p)
        out_i = agent2.after_train(states[i], ctx)
        got = jax.tree_util.tree_leaves(
            out_stacked.agent["normalized_fisher"])
        want = jax.tree_util.tree_leaves(out_i.agent["normalized_fisher"])
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
