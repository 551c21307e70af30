"""CN-DPM at the reference's REAL sleep budget, on the TPU (VERDICT r2 #5).

Runs the CN-DPM agent with the published constants — SLEEP_STEP_G/D =
4000/1000 (reference utils/global_vars.py:17-18), stm_capacity 1000
(config/agent/cndpm/cndpm_1k.yml), VAE_Z_SAMPLES 16 — over a synthetic
stream long enough for two wake+sleep cycles (reference
models/ndpm/ndpm.py:105-187), and asserts: experts are born, the CRP prior
updates, losses stay finite. Persists the wall-time row to
results/cndpm_full_budget.json; bench.py folds it into BENCH_SUITE.json.

Usage: python tools/cndpm_full_budget.py  (~several minutes on the TPU; the
step program embeds the full 5000-step sleep loop in its lax.cond branch)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from ocl_tpu.config import apply_platform_env, default_params

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    import ocl_tpu.models.ndpm_vars as V
    from ocl_tpu.registry import agents

    assert V.SLEEP_STEP_G == 4000 and V.SLEEP_STEP_D == 1000, (
        "ndpm_vars must carry the reference budget", V.SLEEP_STEP_G)
    assert V.VAE_Z_SAMPLES == 16

    p = default_params(
        data="synthetic", agent="CNDPM", stm_capacity=1000, max_experts=4,
        classifier_chill=0.01, log_alpha=-300.0, optimizer="Adam",
        learning_rate=0.001, weight_decay=1e-5, batch=10, verbose=False)
    agent = agents["CNDPM"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    agent.before_train(list(range(10)))

    fn = jax.jit(agent._build_train_task_fn(), donate_argnums=0)

    g = np.random.RandomState(0)
    # two distributionally distinct tasks (novelty is what routes samples to
    # the STM once an expert exists — reference ndpm.py:52-62): 115 steps x
    # batch 10 = 1150 samples/task -> the 1000-slot STM fills once per task
    n_steps = 115

    def task(lo, hi, cls):
        x = jnp.asarray(lo + (hi - lo) * g.rand(n_steps, 10, 32, 32, 3),
                        jnp.float32)
        y = jnp.asarray(cls + g.randint(0, 2, (n_steps, 10)), jnp.int32)
        return x, y

    x1, y1 = task(0.0, 0.45, 0)
    x2, y2 = task(0.55, 1.0, 2)

    t0 = time.time()
    state, metrics = fn(state, x1, y1)
    np.asarray(metrics["loss"])  # force sync through the tunnel
    t_total = time.time() - t0
    print(f"task 1 (cold, incl. compile): {t_total:.1f}s "
          f"experts={int(np.asarray(state.agent['active']))}", flush=True)
    t1 = time.time()
    state, metrics = fn(state, x2, y2)
    loss = np.asarray(metrics["loss"])
    t_warm = time.time() - t1
    print(f"task 2 (warm): {t_warm:.1f}s "
          f"experts={int(np.asarray(state.agent['active']))}", flush=True)

    active = int(np.asarray(state.agent["active"]))
    log_counts = np.asarray(state.agent["log_counts"])
    saturated = int(np.asarray(state.agent["saturated_sleeps"]))
    n_sleeps = active + saturated  # every sleep births an expert or saturates

    assert active >= 2, f"expected >=2 experts born, got {active}"
    assert np.all(np.isfinite(loss)), "non-finite wake loss"
    born = log_counts[1 : 1 + active]
    assert np.all(np.isfinite(born)) and np.all(born > -300.0), (
        "CRP prior did not update for born experts", log_counts)

    row = {
        "metric": "cndpm_full_budget_sleep",
        "value": round(t_warm, 2),
        "unit": "sec/sleep (warm task: 1 sleep + 115 wake steps)",
        "sleep_step_g": V.SLEEP_STEP_G,
        "sleep_step_d": V.SLEEP_STEP_D,
        "stm_capacity": 1000,
        "vae_z_samples": V.VAE_Z_SAMPLES,
        "experts_born": active,
        "sleeps": int(n_sleeps),
        "wall_cold_s": round(t_total, 1),
        "wall_warm_s": round(t_warm, 1),
        "source": "tools/cndpm_full_budget.py",
    }
    os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
    with open(os.path.join(REPO, "results", "cndpm_full_budget.json"), "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
