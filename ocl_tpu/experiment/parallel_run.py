"""Run-parallel experiments: R independent runs trained simultaneously.

The reference executes `num_runs` sequentially (reference experiment/run.py:
34-70). Online CL at batch size 10 leaves the MXU mostly idle, so here the
*entire experiment* — R runs with different seeds/task orders — vmaps over a
stacked TrainState: every step processes R models' batches at once. This is
the TPU-native counterpart of "one run per GPU", on a single chip.

Works for agents whose task step is a pure scanned function and whose eval
is the softmax path (ER incl. MIR/GSS/ASER strategies, AGEM, EWC, LWF).
Others (GDumb/CNDPM host control flow, NCM-eval agents, review_trick) fall
back to sequential `multiple_run`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.agents.base import TaskCtx
from ocl_tpu.data import continuum, prepare_test_loaders
from ocl_tpu.experiment.metrics import compute_performance
from ocl_tpu.registry import agents

VMAP_CAPABLE = ("ER", "AGEM", "EWC", "LWF")


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def multiple_run_parallel(params, store=False, save_path=None):
    ncm = params.trick.get("ncm_trick") or params.agent in ("ICARL", "SCR", "SCP")
    if (params.agent not in VMAP_CAPABLE or params.trick.get("review_trick")
            or ncm or getattr(params, "error_analysis", False)):
        from ocl_tpu.experiment.run import multiple_run

        return multiple_run(params, store=store, save_path=save_path)
    if len(jax.devices()) == 1 and params.num_runs > 1:
        # On one chip, vmapping R sets of conv weights lowers to grouped
        # convolutions that the TPU tiles poorly — measured ~2x SLOWER in
        # aggregate than running sequentially (BASELINE.md). The vmapped
        # path pays off only when the run axis shards one-per-device.
        print("[parallel_runs] single device: vmapped runs would lower to "
              "grouped convs and lose ~2x aggregate throughput — falling "
              "back to sequential multiple_run. Use a multi-chip mesh "
              "(devices >= num_runs) for one-run-per-device scaling.")
        from ocl_tpu.experiment.run import multiple_run

        return multiple_run(params, store=store, save_path=save_path)

    start = time.time()
    n_runs = params.num_runs
    print("Setting up data stream ({} vmapped runs)".format(n_runs))
    data_continuum = continuum(params.data, params.cl_type, params)
    np.random.seed(params.seed)

    # materialize every run's task stream + test sets (host)
    runs_tasks, runs_tests = [], []
    for run in range(n_runs):
        data_continuum.new_run()
        tasks = list(data_continuum)
        runs_tasks.append(tasks)
        runs_tests.append(prepare_test_loaders(data_continuum.test_data(), params))
    n_tasks = len(runs_tasks[0])

    agent = agents[params.agent](params)
    states = [agent.init_state(jax.random.PRNGKey(params.seed + r))
              for r in range(n_runs)]
    state = _stack(states)

    # one-run-per-chip placement: with >= n_runs devices, shard the run axis
    # so each device trains its own run with plain (un-batched) convolutions —
    # the scaling path for multi-chip meshes. Single chip: all runs local.
    run_sharding = None
    if len(jax.devices()) >= n_runs > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ocl_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(n_runs)
        run_sharding = NamedSharding(mesh, P("data"))
        state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, run_sharding), state)
        print("runs sharded one-per-device over {} devices".format(n_runs))

    task_fn = jax.jit(jax.vmap(agent._build_train_task_fn()), donate_argnums=0)

    @jax.jit
    def eval_fn(state, x, y, m):
        def one(params, stats, x, y, m):
            def body(c, inp):
                xb, yb, mb = inp
                logits = agent.forward_eval_logits(params, stats, xb)
                return c + jnp.sum((jnp.argmax(logits, 1) == yb) & mb), None

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (x, y, m))
            return c

        return jax.vmap(one)(state.params, state.batch_stats, x, y, m)

    # per-run host label bookkeeping
    old_labels = [set() for _ in range(n_runs)]
    n_cls = agent.n_classes
    acc = np.zeros((n_runs, n_tasks, n_tasks))

    # stacked test loaders per task: [R, nb, B, ...]
    test_stacked = []
    for t in range(n_tasks):
        xs = _stack([runs_tests[r][t][0] for r in range(n_runs)])
        ys = _stack([runs_tests[r][t][1] for r in range(n_runs)])
        ms = _stack([runs_tests[r][t][2] for r in range(n_runs)])
        test_stacked.append((xs, ys, ms))

    stream_images = 0
    t_train = 0.0
    for t in range(n_tasks):
        ctxs, xs_all, ys_all, new_rngs = [], [], [], []
        rng_stack = np.asarray(state.rng)  # [R, key] per-run rng lanes
        epochs = max(1, int(getattr(params, "epoch", 1)))
        for r in range(n_runs):
            x, y, labels = runs_tasks[r][t]
            new = sorted(set(int(v) for v in np.asarray(y).reshape(-1)))
            old_mask = np.zeros(n_cls, bool)
            old_mask[sorted(old_labels[r])] = True
            new_mask = np.zeros(n_cls, bool)
            new_mask[new] = True
            ctxs.append(TaskCtx(old_mask=jnp.asarray(old_mask),
                                new_mask=jnp.asarray(new_mask),
                                task_seen=jnp.asarray(t, jnp.int32)))
            # identical shuffle derivation to the sequential runner
            # (agents/base.py batchify): split the run's live rng lane, fold
            # in the epoch — seed-paired runs reproduce multiple_run exactly
            rng_r, shuffle_rng = jax.random.split(rng_stack[r])
            new_rngs.append(rng_r)
            nb = x.shape[0] // params.batch
            xs_r, ys_r = [], []
            for ep in range(epochs):
                perm = np.asarray(jax.random.permutation(
                    jax.random.fold_in(shuffle_rng, ep), x.shape[0]))
                xs_r.append(np.asarray(x)[perm][: nb * params.batch].reshape(
                    nb, params.batch, *x.shape[1:]))
                ys_r.append(np.asarray(y)[perm][: nb * params.batch].reshape(
                    nb, params.batch).astype(np.int32))
            xs_all.append(np.concatenate(xs_r))
            ys_all.append(np.concatenate(ys_r))
            old_labels[r].update(new)
        state = state.replace(rng=jnp.stack(new_rngs))
        ctx = _stack(ctxs)
        xs = jnp.asarray(np.stack(xs_all), jnp.float32)
        ys = jnp.asarray(np.stack(ys_all))
        if run_sharding is not None:
            ctx = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, run_sharding), ctx)
            xs = jax.device_put(xs, run_sharding)
            ys = jax.device_put(ys, run_sharding)

        t0 = time.time()
        state, _ = task_fn(state, ctx, xs, ys)
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params)[0])
        t_train += time.time() - t0
        stream_images += int(np.prod(xs.shape[:3]))

        for tt in range(t + 1):
            correct = np.asarray(eval_fn(state, *test_stacked[tt]))
            totals = np.asarray(jnp.sum(test_stacked[tt][2], axis=(1, 2)))
            acc[:, t, tt] = correct / np.maximum(totals, 1)
        if params.verbose:
            print("task {}: acc {}".format(t, acc[:, t, : t + 1].mean(axis=0)))

    end = time.time()
    if store:
        import os
        import pickle

        from ocl_tpu.utils.io import load_yaml

        result_path = load_yaml("config/global.yml", key="path")["result"]
        table_path = result_path + params.data
        os.makedirs(table_path, exist_ok=True)
        if not save_path:
            save_path = getattr(params, "model_name", params.agent) + "_" + \
                getattr(params, "data_name", params.data) + ".pkl"
        with open(table_path + "/" + save_path, "wb") as f:
            pickle.dump({"time": end - start, "acc_array": acc}, f)
    avg_end_acc, avg_end_fgt, avg_acc, avg_bwtp, avg_fwt = compute_performance(acc)
    print("----------- Total {} run: {}s -----------".format(n_runs, end - start))
    print("----------- aggregate stream throughput {:.1f} images/sec "
          "(incl. compile) -----------".format(stream_images / max(t_train, 1e-9)))
    print("----------- Avg_End_Acc {} Avg_End_Fgt {} Avg_Acc {} Avg_Bwtp {} Avg_Fwt {}-----------"
          .format(avg_end_acc, avg_end_fgt, avg_acc, avg_bwtp, avg_fwt))
    return avg_end_acc, avg_end_fgt, avg_acc, avg_bwtp, avg_fwt
