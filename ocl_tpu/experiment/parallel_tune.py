"""Grid-parallel hyperparameter tuning: every (grid point, val run) trains at
once (SURVEY.md §7.7 "one-grid-point-per-device").

The reference evaluates its lr/weight_decay grids sequentially — 28 full
training runs for ER's 7x4 grid (reference experiment/run.py:238-305 +
tune_hyperparam.py) — and, because lr/wd are baked constants, every grid
point is a DISTINCT compiled program. Here, grids whose varying keys are pure
optimizer scalars (learning_rate / weight_decay) share ONE jitted program:
the agent is built with `optax.inject_hyperparams` so lr/wd live in
`opt_state.hyperparams` as array leaves, states for all G*R points are
stacked, and the scanned task fn is vmapped over the stacked axis — each
point carries its own hyperparams in its own optimizer state. On a multi-chip
mesh the point axis is padded to a multiple of the device count and sharded
one-per-device; on a single device the stacked program still wins because the
sequential loop is compile-dominated — measured on the reference's own ER
tuning axis: 7 points sequential 766.7 s (cold) / 7x24.0 s (warm) vs stacked
121.6 s cold / 38.7 s warm on ONE chip (tools/bench_tune.py,
results/bench_tune.json, docs/PERFORMANCE.md §tuning). The gate below is
therefore a MEMORY bound (all points' states live on-device at once), not an
occupancy bound.

All points consume identical tune batches (in_axes=None), which also makes
the comparison between grid points paired rather than independently shuffled.

Agents supported: ER/AGEM/LWF are plain stacked scans; EWC provides
point-axis-aware fisher hooks; iCaRL shares its host-side compact-label
bookkeeping and evaluates through the stacked NCM path below; GDumb builds
its lr-independent balanced memory once and vmaps only the per-point
retrain (agents/gdumb.py::stacked_train_task).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.experiment.metrics import compute_performance
from ocl_tpu.experiment.parallel_run import _stack
from ocl_tpu.registry import agents

INJECTABLE = {"learning_rate", "weight_decay"}
# agents whose per-task transitions are safe on a stacked state: ER/AGEM
# have no device-side after_train work, LWF's teacher snapshot is leaf-wise,
# EWC provides point-axis-aware before_task_stacked/after_train_stacked
# hooks (its fisher normalization reduces per point), iCaRL's teacher
# snapshot is leaf-wise and its NCM eval has a stacked path here, and GDumb
# overrides stacked_train_task with a shared-memory vmapped retrain.
GRID_CAPABLE = ("ER", "AGEM", "LWF", "EWC", "ICARL", "GDUMB")

# default on-device budget for the stacked states (buffers dominate); the
# real constraint on stacking is HBM, not points-per-device — see module
# docstring for the measured single-device win
STACK_BYTES_BUDGET = int(os.environ.get("OCL_TPU_TUNE_STACK_BYTES",
                                        8 << 30))


def _stack_bytes_estimate(params, total_points: int) -> int:
    """Rough per-point on-device footprint: the episodic buffer (f32 images)
    plus a 64 MiB allowance for params + Adam state + BN stats (reduced
    ResNet-18 at nf=20 is ~1.1M params ~= 13 MiB with optimizer state)."""
    from ocl_tpu.config import input_size_match

    shape = input_size_match.get(getattr(params, "data", "cifar10"),
                                 [32, 32, 3])
    per_img = int(np.prod(shape)) * 4
    mem = int(getattr(params, "mem_size", 0) or 0)
    return total_points * (mem * per_img + (64 << 20))


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
    # NCM eval has a stacked path (vmapped exemplar means) — but it reads
    # the episodic buffer, which GDumb does not keep
    if trick.get("ncm_trick") and eff.get("agent") == "GDUMB":
        return False
    if trick.get("review_trick") or bool(eff.get("error_analysis", False)):
        return False
    g_points = 1
    for v in tune_params.values():
        if isinstance(v, (list, tuple)):
            g_points *= max(1, len(v))
    total = g_points * max(1, int(getattr(default_params, "num_runs_val", 1)))
    est = _stack_bytes_estimate(default_params, total)
    if est > STACK_BYTES_BUDGET:
        print("parallel grid skipped: {} stacked points need ~{:.1f} GiB "
              "on-device (> {:.1f} GiB budget, OCL_TPU_TUNE_STACK_BYTES) "
              "— sequential tuning".format(
                  total, est / (1 << 30), STACK_BYTES_BUDGET / (1 << 30)))
        return False
    return True


def _make_stacked_ncm(agent0):
    """Stacked nearest-class-mean eval (iCaRL / ncm_trick): per point,
    exemplar means over its own buffer then argmin-distance classification —
    the vmapped counterpart of agents/base.py::_evaluate_ncm (reference
    agents/base.py:121-176), same empty-class random-mean semantics with the
    noise drawn from each point's rng via the same fold_in(rng, 7)."""
    from ocl_tpu.buffer.state import valid_mask
    from ocl_tpu.models import feature_dim_for, features_eval

    module, n_cls = agent0.module, agent0.n_classes
    feat_dim = feature_dim_for(agent0.data, getattr(agent0.params, "nf", 20))

    def means_one(params, stats, imgs, labels, valid, rng):
        chunk = 256
        n = imgs.shape[0]
        pad = (-n) % chunk
        im = jnp.pad(imgs, ((0, pad),) + ((0, 0),) * (imgs.ndim - 1))
        im = im.reshape(-1, chunk, *imgs.shape[1:])

        def body(_, xb):
            return None, features_eval(module, params, stats, xb)

        _, feats = jax.lax.scan(body, None, im)
        feats = feats.reshape(-1, feats.shape[-1])[:n]
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        w = valid.astype(jnp.float32)
        sums = jnp.zeros((n_cls, feats.shape[-1])).at[labels].add(
            feats * w[:, None])
        cnts = jnp.zeros((n_cls,)).at[labels].add(w)
        means = sums / jnp.maximum(cnts, 1.0)[:, None]
        noise = jax.random.normal(jax.random.fold_in(rng, 7),
                                  (n_cls, feat_dim))
        means = jnp.where((cnts > 0)[:, None], means, noise)
        return means / jnp.maximum(
            jnp.linalg.norm(means, axis=1, keepdims=True), 1e-12)

    @jax.jit
    def means_fn(state):
        valid = jax.vmap(valid_mask)(state.buffer)
        return jax.vmap(means_one)(state.params, state.batch_stats,
                                   state.buffer.imgs, state.buffer.labels,
                                   valid, state.rng)

    def classify_one(params, stats, means, seen, x, y, m):
        def body(c, inp):
            xb, yb, mb = inp
            f = features_eval(module, params, stats, xb)
            f = f / jnp.maximum(
                jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
            d = jnp.sum((f[:, None, :] - means[None, :, :]) ** 2, axis=-1)
            d = jnp.where(seen[None, :], d, jnp.inf)
            return c + jnp.sum((jnp.argmin(d, axis=1) == yb) & mb), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (x, y, m))
        return c

    @jax.jit
    def classify_fn(state, means, seen, x, y, m):
        return jax.vmap(classify_one,
                        in_axes=(0, 0, 0, None, None, None, None))(
            state.params, state.batch_stats, means, seen, x, y, m)

    return means_fn, classify_fn


def tune_hyper_parallel(tune_data, tune_test_loaders, default_params,
                        tune_params, grid, merged):
    """Returns the winning grid dict (same contract as tune_hyper)."""
    R = int(default_params.num_runs_val)
    G = len(grid)
    n_dev = len(jax.devices())
    points = [(g, r) for g in range(G) for r in range(R)]
    # pad to a device multiple so the point axis always shards one-per-device
    # on a mesh (no padding on a single device)
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

    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ocl_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(n_dev)
        sharding = NamedSharding(mesh, P("data"))
        state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), state)
        print("tuning points sharded over {} devices".format(n_dev))
    else:
        print("tuning points stacked on one device (one vmapped program; "
              "the sequential loop compiles one program per grid point — "
              "docs/PERFORMANCE.md §tuning)")

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

    ncm_fns = _make_stacked_ncm(agent0) if agent0.ncm_classify else None

    acc = np.zeros((n_real, len(tune_data), len(tune_test_loaders)))
    # dedicated shuffle key: must not alias any point's in-training rng
    # (point (0,0)'s stacked state still carries PRNGKey(seed+1000))
    shuffle_state = states_r[0].replace(
        rng=jax.random.PRNGKey(seed + 999_983))
    for t, (x_train, y_train, _labels) in enumerate(tune_data):
        # agent0 carries the host-side label bookkeeping for all points
        # (identical streams => identical label sets), exactly like the
        # sequential loop's per-agent before_train/after_train
        ctx = agent0.before_train(y_train)
        state = agent0.before_task_stacked(state)
        if agent0.stacked_consumes_raw:
            state = agent0.stacked_train_task(state, ctx, x_train, y_train)
        else:
            # shared shuffle for all points (paired comparison)
            shuffle_state, xs, ys = agent0.batchify(shuffle_state, x_train,
                                                    y_train)
            state = agent0.stacked_train_task(state, ctx, xs, ys)
        state = agent0.after_train_stacked(state, ctx)
        if ncm_fns is not None:
            seen = np.zeros(agent0.n_classes, bool)
            seen[agent0.old_labels] = True
            seen = jnp.asarray(seen)
            means = ncm_fns[0](state)
            for tt, (x, y, m) in enumerate(tune_test_loaders):
                correct = np.asarray(ncm_fns[1](state, means, seen,
                                                x, y, m))[:n_real]
                acc[:, t, tt] = correct / max(int(np.sum(np.asarray(m))), 1)
        else:
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
