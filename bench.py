"""Benchmark: ER online stream throughput (images/sec) on the local device.

Mirrors the reference's hot loop (agents/exp_replay.py:34-92) at its default
shape: Reduced ResNet-18, batch 10, eps_mem_batch 10, mem 1000, cifar-sized
inputs — forward/backward on the batch, random retrieve, forward/backward on
memory, SGD step, reservoir update, per step.

vs_baseline: measured torch-CPU reference-equivalent loop on this host
(tools/measure_torch_baseline.py; see BASELINE.md): 45.3 stream images/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

TORCH_CPU_BASELINE_IMGS_PER_SEC = 45.3  # measured: tools/measure_torch_baseline.py


def main():
    from ocl_tpu.config import apply_platform_env, default_params

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", mem_size=1000, batch=10,
                       eps_mem_batch=10, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train(list(range(10)))
    fn = agent._build_train_task()

    n_steps = 500
    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(n_steps, 10, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 10, (n_steps, 10)), jnp.int32)

    # compile + warm the buffer (host fetch forces full sync on every backend)
    state, m = fn(state, ctx, xs, ys)
    np.asarray(m["loss"])

    # best-of-3 to ride out tunnel/host contention noise
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        state, m = fn(state, ctx, xs, ys)
        np.asarray(m["loss"])
        best = min(best, time.time() - t0)

    imgs_per_sec = n_steps * 10 / best
    print(json.dumps({
        "metric": "er_stream_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / TORCH_CPU_BASELINE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
