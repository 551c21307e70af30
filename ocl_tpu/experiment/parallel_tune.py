"""Grid-parallel hyperparameter tuning: every (grid point, val run) trains at
once (SURVEY.md §7.7 "one-grid-point-per-device").

The reference evaluates its lr/weight_decay grids sequentially — 28 full
training runs for ER's 7x4 grid (reference experiment/run.py:238-305 +
tune_hyperparam.py). Here, grids whose varying keys are pure optimizer
scalars (learning_rate / weight_decay) share ONE jitted program: the agent is
built with `optax.inject_hyperparams` so lr/wd live in `opt_state.hyperparams`
as array leaves, states for all G*R points are stacked, and the scanned task
fn is vmapped over the stacked axis — each point carries its own hyperparams
in its own optimizer state. The point axis is padded to a multiple of the
device count and sharded one-per-device on a multi-chip mesh; on a single
device the caller should fall back to the sequential loop (vmapped conv
weights lower poorly there, see experiment/parallel_run.py).

All points consume identical tune batches (in_axes=None), which also makes
the comparison between grid points paired rather than independently shuffled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.experiment.metrics import compute_performance
from ocl_tpu.experiment.parallel_run import _stack
from ocl_tpu.registry import agents

INJECTABLE = {"learning_rate", "weight_decay"}
# agents whose per-task transitions are safe on a stacked state: ER/AGEM
# have no device-side after_train work, LWF's teacher snapshot is leaf-wise,
# and EWC provides point-axis-aware before_task_stacked/after_train_stacked
# hooks (its fisher normalization reduces per point).
GRID_CAPABLE = ("ER", "AGEM", "LWF", "EWC")


def supports_parallel_grid(default_params, tune_params) -> bool:
    varying = {k for k, v in tune_params.items()
               if isinstance(v, (list, tuple)) and len(v) > 1}
    if not varying or not varying <= INJECTABLE:
        return False
    # guard against the *effective* per-point params: length-1 grid lists
    # override the defaults without being "varying" (e.g. retrieve: [MIR])
    eff = dict(vars(default_params))
    eff.update({k: (v[0] if isinstance(v, (list, tuple)) else v)
                for k, v in tune_params.items() if k not in varying})
    if eff.get("agent") not in GRID_CAPABLE:
        return False
    # MIR's virtual step uses the *configured* lr (buffer/mir.py), which is
    # baked per-agent — a traced per-point lr can't reach it; fall back.
    if eff.get("retrieve") == "MIR" and "learning_rate" in varying:
        return False
    trick = dict(default_params.trick)
    for k in ("ncm_trick", "review_trick"):
        if isinstance(eff.get(k), bool):
            trick[k] = eff[k]
    if trick.get("ncm_trick") or trick.get("review_trick") or \
            bool(eff.get("error_analysis", False)):
        return False
    n_dev = len(jax.devices())
    if n_dev <= 1:
        return False
    # occupancy gate: stacked points per device run through the vmapped
    # batched-weight conv path (~2x slower per point than sequential —
    # parallel_run.py's fallback rationale), so the win only survives up to
    # ~2 points/device; beyond that the sequential loop is faster
    g_points = 1
    for v in tune_params.values():
        if isinstance(v, (list, tuple)):
            g_points *= max(1, len(v))
    total = g_points * max(1, int(getattr(default_params, "num_runs_val", 1)))
    if (total + n_dev - 1) // n_dev > 2:
        print("parallel grid skipped: {} points over {} devices "
              "(>2 stacked points/device loses to sequential)".format(
                  total, n_dev))
        return False
    return True


def tune_hyper_parallel(tune_data, tune_test_loaders, default_params,
                        tune_params, grid, merged):
    """Returns the winning grid dict (same contract as tune_hyper)."""
    from ocl_tpu.agents.base import TaskCtx

    R = int(default_params.num_runs_val)
    G = len(grid)
    n_dev = len(jax.devices())
    points = [(g, r) for g in range(G) for r in range(R)]
    # pad to a device multiple so the point axis always shards one-per-device
    # (unsharded vmapped convs on one device are the slow grouped-conv path)
    n_real = len(points)
    while len(points) % n_dev:
        points.append(points[-1])
    print("{} grid points x {} val runs = {} vmapped tuning states "
          "({} padding)".format(G, R, len(points), len(points) - n_real))

    # one agent per grid point (hyperparams live in its injected opt_state);
    # one model init per val run (grid points at the same r share init
    # weights, like the sequential loop); agent 0's step fn serves all points
    agents_g = []
    for g in range(G):
        pg = merged(default_params, dict(grid[g], inject_hp=True))
        agents_g.append(agents[pg.agent](pg))
    agent0 = agents_g[0]
    seed = int(default_params.seed)
    states_r = [agent0.init_state(jax.random.PRNGKey(seed + 1000 + r))
                for r in range(R)]
    point_states = [
        states_r[r].replace(opt_state=agents_g[g].tx.init(states_r[r].params))
        for g, r in points
    ]
    state = _stack(point_states)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocl_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(n_dev)
    sharding = NamedSharding(mesh, P("data"))
    state = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), state)
    print("tuning points sharded over {} devices".format(n_dev))

    task_fn = jax.jit(jax.vmap(agent0._build_train_task_fn(),
                               in_axes=(0, None, None, None)),
                      donate_argnums=0)

    @jax.jit
    def eval_fn(state, x, y, m):
        def one(params, stats, x, y, m):
            def body(c, inp):
                xb, yb, mb = inp
                logits = agent0.forward_eval_logits(params, stats, xb)
                return c + jnp.sum((jnp.argmax(logits, 1) == yb) & mb), None

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (x, y, m))
            return c

        return jax.vmap(one, in_axes=(0, 0, None, None, None))(
            state.params, state.batch_stats, x, y, m)

    n_cls = agent0.n_classes
    old = np.zeros(n_cls, bool)
    acc = np.zeros((n_real, len(tune_data), len(tune_test_loaders)))
    # dedicated shuffle key: must not alias any point's in-training rng
    # (point (0,0)'s stacked state still carries PRNGKey(seed+1000))
    shuffle_state = states_r[0].replace(
        rng=jax.random.PRNGKey(seed + 999_983))
    for t, (x_train, y_train, _labels) in enumerate(tune_data):
        new = np.zeros(n_cls, bool)
        new[sorted(set(int(v) for v in np.asarray(y_train).reshape(-1)))] = True
        ctx = TaskCtx(old_mask=jnp.asarray(old), new_mask=jnp.asarray(new),
                      task_seen=jnp.asarray(t, jnp.int32))
        # shared shuffle for all points (paired comparison)
        shuffle_state, xs, ys = agent0.batchify(shuffle_state, x_train, y_train)
        state = agent0.before_task_stacked(state)
        state, _ = task_fn(state, ctx, xs, ys)
        state = agent0.after_train_stacked(state, ctx)
        old |= new
        for tt, (x, y, m) in enumerate(tune_test_loaders):
            correct = np.asarray(eval_fn(state, x, y, m))[:n_real]
            acc[:, t, tt] = correct / max(int(np.sum(np.asarray(m))), 1)

    acc = acc.reshape(G, R, len(tune_data), len(tune_test_loaders))
    tune_accs = []
    for g in range(G):
        (end_acc, _ci), *_ = compute_performance(acc[g])
        tune_accs.append(end_acc)
        print("{} -> avg_end_acc {:.4f}".format(grid[g], end_acc))
    return grid[int(np.argmax(tune_accs))]
