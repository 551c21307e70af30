"""Tuning-harness benchmark: sequential grid search vs the grid-parallel
vmapped path, at the reference's real ER paper grid (VERDICT r4 #6).

The reference tunes by a sequential loop over the full cartesian grid
(reference experiment/tune_hyperparam.py:10-41 + run.py:238-305): for ER's
published grid (config/agent/er/er_tune.yml: 7 learning rates x 4 weight
decays = 28 points) that is 28 independent full training runs, each paying
its own compile (lr/wd are baked constants, so every point is a distinct
program).

ocl_tpu's grid-parallel path (experiment/parallel_tune.py) instead stacks
all points into ONE vmapped program with optax-injected hyperparams — one
compile for the whole grid — and shards the point axis one-per-device on a
multi-chip mesh. On this host there is a single real TPU chip, so this
bench measures the two quantities that decide the crossover, and projects
the multi-chip wall from them:

  * sequential: per-point compile wall + per-point run wall (the reference
    cost model), measured on the lr axis of the real grid;
  * stacked-on-one-chip: one compile + one run of all points vmapped on a
    single device. (When first measured this regime was behind a
    points-per-device occupancy gate; the measured 6.3x single-chip win is
    what retired that gate — supports_parallel_grid now bounds only the
    stacked states' memory, experiment/parallel_tune.py.)
  * projected N-chip grid-parallel: stacked compile (once) + stacked run
    scaled by 1/N — points are independent, the point axis shards
    one-per-device with no cross-point collectives, so scaling is linear
    in devices until points/device reaches 1 (then the grouped-conv
    penalty vanishes too, making 1/N conservative).

Output: one JSON blob + a markdown table fragment for docs/PERFORMANCE.md.

Usage (TPU):  python tools/bench_tune.py --points 7 --steps 100
        (CPU): env JAX_PLATFORMS=cpu python tools/bench_tune.py --nf 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocl_tpu.config import apply_platform_env  # noqa: E402

apply_platform_env()

# the reference's published ER grid axes (config/agent/er/er_tune.yml)
REF_LRS = [0.0001, 0.0003, 0.001, 0.003, 0.01, 0.03, 0.1]
REF_WDS = [0.0001, 0.001, 0.01, 0.1]


def make_inputs(args):
    g = np.random.RandomState(0)
    n = args.batch * args.steps
    tune_data = []
    for t in range(args.tasks):
        x = g.rand(n, 32, 32, 3).astype(np.float32)
        y = g.randint(2 * t, 2 * t + 2, n).astype(np.int64)
        tune_data.append((x, y, None))
    tx = g.rand(args.tasks, args.test_batch, 32, 32, 3).astype(np.float32)
    loaders = [(tx[t][None], g.randint(0, 2 * args.tasks,
                                       (1, args.test_batch)).astype(np.int64),
                np.ones((1, args.test_batch), bool))
               for t in range(args.tasks)]
    return tune_data, loaders


def bench_sequential(tune_data, loaders, params_ns, grid):
    """The reference's cost model: one full (agent, compile, train) per grid
    point (reference run.py:272-289). Returns (total, first_point) walls —
    first_point isolates one compile+run; later points may reuse nothing
    (distinct baked lr/wd constants -> distinct programs)."""
    import jax

    from ocl_tpu.experiment.tune import _merged
    from ocl_tpu.registry import agents

    t0 = time.perf_counter()
    point_walls = []
    tune_accs = []
    for param_set in grid:
        tp = time.perf_counter()
        fp = _merged(params_ns, param_set)
        agent = agents[fp.agent](fp)
        state = agent.init_state(jax.random.PRNGKey(fp.seed + 1000))
        tmp = []
        for x, y, _ in tune_data:
            state = agent.train_learner(state, x, y)
            tmp.append(agent.evaluate(state, loaders))
        tune_accs.append(float(np.mean(tmp[-1])))
        point_walls.append(time.perf_counter() - tp)
    return time.perf_counter() - t0, point_walls, tune_accs


def bench_stacked(tune_data, loaders, params_ns, tune_params, grid):
    from ocl_tpu.experiment.parallel_tune import tune_hyper_parallel
    from ocl_tpu.experiment.tune import _merged

    t0 = time.perf_counter()
    best = tune_hyper_parallel(tune_data, loaders, params_ns, tune_params,
                               grid, _merged)
    return time.perf_counter() - t0, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=7,
                    help="grid points from the reference lr axis (wd fixed); "
                         "7 = the full published lr axis")
    ap.add_argument("--full28", action="store_true",
                    help="run the full 7x4 grid (28 sequential compiles)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--tasks", type=int, default=2)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--test_batch", type=int, default=64)
    ap.add_argument("--nf", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "bench_tune.json"))
    args = ap.parse_args()

    import jax

    from ocl_tpu.config import default_params

    if args.full28:
        tune_params = {"learning_rate": REF_LRS, "weight_decay": REF_WDS}
    else:
        tune_params = {"learning_rate": REF_LRS[: args.points],
                       "weight_decay": [REF_WDS[0]]}
    from ocl_tpu.experiment.tune import parameter_grid

    grid = parameter_grid(tune_params)
    params_ns = default_params(
        data="synthetic", agent="ER", retrieve="random", update="random",
        num_tasks=args.tasks, mem_size=500, eps_mem_batch=args.batch,
        batch=args.batch, nf=args.nf, num_runs_val=1, verbose=False)

    tune_data, loaders = make_inputs(args)
    dev = jax.devices()[0]
    print("device: {} | grid: {} points | {} tasks x {} steps x batch {}"
          .format(dev.device_kind, len(grid), args.tasks, args.steps,
                  args.batch), flush=True)

    seq_total, seq_points, seq_accs = bench_sequential(
        tune_data, loaders, params_ns, grid)
    print("sequential: total {:.1f}s | per-point {} | accs {}".format(
        seq_total, ["{:.1f}".format(w) for w in seq_points],
        ["{:.3f}".format(a) for a in seq_accs]), flush=True)

    # steady-state run wall per point: re-run point 0 (program now cached)
    t0 = time.perf_counter()
    _, _, _ = bench_sequential(tune_data, loaders, params_ns, grid[:1])
    seq_warm_point = time.perf_counter() - t0
    print("sequential warm re-run of point 0: {:.1f}s".format(seq_warm_point),
          flush=True)

    stk_total, best = bench_stacked(tune_data, loaders, params_ns,
                                    tune_params, grid)
    print("stacked (1 device, forced): total {:.1f}s | best {}".format(
        stk_total, best), flush=True)
    t0 = time.perf_counter()
    stk_total_warm, _ = bench_stacked(tune_data, loaders, params_ns,
                                      tune_params, grid)
    stk_total_warm = time.perf_counter() - t0
    print("stacked warm: {:.1f}s".format(stk_total_warm), flush=True)

    G = len(grid)
    stk_compile = stk_total - stk_total_warm
    report = {
        "device": dev.device_kind,
        "grid_points": G,
        "tasks": args.tasks, "steps_per_task": args.steps,
        "batch": args.batch, "nf": args.nf,
        "sequential_total_s": round(seq_total, 2),
        "sequential_per_point_s": [round(w, 2) for w in seq_points],
        "sequential_warm_point_s": round(seq_warm_point, 2),
        "stacked_1dev_total_s": round(stk_total, 2),
        "stacked_1dev_warm_s": round(stk_total_warm, 2),
        "stacked_compile_s": round(stk_compile, 2),
        # projections: stacked run scales 1/N (independent points, sharded
        # one-per-device, no cross-point collectives); compile is once.
        "projected_8chip_s": round(stk_compile + stk_total_warm / 8, 2),
        "projected_Nchip_equals_G_s": round(stk_compile + stk_total_warm / G, 2),
        "speedup_8chip_vs_sequential": round(
            seq_total / (stk_compile + stk_total_warm / 8), 2),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
