"""Measure the GSS replacement-gate rate: what fraction of full-buffer steps
take the expensive replace branch (batch_sim < 0, reference
gss_greedy_update.py:25)?

The jvp gate (buffer/gss.py) makes non-replacing steps skip the gradient
bank entirely, so the steady-state GSS step cost is
  gate_cost + P(replace) * bank_cost.
This probe replays the REAL agent trajectory (the same jitted scan body,
driven one batch per call so the gate can be sampled against the live
state) on two streams and reports P(replace):

  - "iid": the bench stream (uniform labels over all classes, the shape
    BENCH_SUITE.json's er_gss row measures);
  - "class-incremental": the parity-harness shape (classes arrive two per
    task), where distribution shift makes negative cosines more likely.

Usage:  python tools/probe_gss_gate.py [--steps 300] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--mem_size", type=int, default=500)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--nf", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from ocl_tpu.config import apply_platform_env, default_params

    apply_platform_env()

    import jax
    import jax.numpy as jnp

    from ocl_tpu.buffer.gss import build_gss_update
    from ocl_tpu.ops.losses import NEG_INF
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", update="GSS",
                       gss_mem_strength=10, gss_batch_size=10,
                       mem_size=args.mem_size, batch=args.batch,
                       eps_mem_batch=10, nf=args.nf, verbose=False)
    agent = agents[p.agent](p)
    upd = build_gss_update(agent)
    task_fn = jax.jit(agent._build_train_task_fn())  # no donation: state reused

    @jax.jit
    def gate_sim(state, x, y, key):
        xs, ys, ms, row_valid = upd.sample_bank_batches(state.buffer, key)
        bgrad = jax.grad(upd.ce_eval)(state.params, state.batch_stats, x, y)
        dots = upd.bank_dots(state.params, state.batch_stats, xs, ys, ms, bgrad)
        return jnp.max(jnp.where(row_valid, dots, NEG_INF))

    def run(stream):
        state = agent.init_state(jax.random.PRNGKey(0))
        ctx = agent.before_train(list(range(10)))
        key = jax.random.PRNGKey(123)
        full_steps = replaces = 0
        for t, (x, y) in enumerate(stream):
            xb = jnp.asarray(x, jnp.float32)[None]
            yb = jnp.asarray(y, jnp.int32)[None]
            if int(state.buffer.current_index) >= args.mem_size:
                key, sub = jax.random.split(key)
                sim = float(gate_sim(state, xb[0], yb[0], sub))
                full_steps += 1
                replaces += int(sim < 0)
            state, _ = task_fn(state, ctx, xb, yb)
        return full_steps, replaces

    g = np.random.RandomState(0)
    iid = [(g.rand(args.batch, 32, 32, 3).astype(np.float32),
            g.randint(0, 10, args.batch)) for _ in range(args.steps)]

    # the parity-harness stream: class-conditional synthetic images,
    # two classes per task (tools/parity_vs_reference.py:make_stream)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import parity_vs_reference as pv

    tasks, _tests = pv.make_stream(seed=1, per_class=200, difficulty=0.85,
                                   num_tasks=5)
    ci = []
    for x, y in tasks:
        for i in range(0, len(y) - args.batch + 1, args.batch):
            ci.append((np.asarray(x[i:i + args.batch], np.float32),
                       np.asarray(y[i:i + args.batch])))

    for name, stream in (("iid", iid), ("class-incremental", ci)):
        full, repl = run(stream)
        rate = repl / full if full else float("nan")
        print(f"[{name}] full-buffer steps {full}, replaces {repl}, "
              f"gate rate {rate:.2%}", flush=True)


if __name__ == "__main__":
    main()
