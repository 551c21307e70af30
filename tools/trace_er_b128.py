"""Trace-level attribution of the MXU-friendly ER step (VERDICT r3 #9).

The batch-128 bf16 ER row reaches ~26% MFU; the analytic FLOP counter says
the other ~74% is not matmul math. This tool captures a jax.profiler device
trace of the scanned step on the local device, parses the perfetto
trace.json.gz the profiler writes, and aggregates device-op time into
buckets (convolutions/matmuls vs fused elementwise/BN vs copies/layout vs
everything else), so docs/PERFORMANCE.md can name the residual instead of
guessing.

Run on the TPU:  python tools/trace_er_b128.py [--steps 50]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


BUCKETS = (
    # (bucket, substrings matched against the lowered op name)
    ("conv/matmul (MXU)", ("convolution", "conv", "dot", "matmul")),
    ("copies/layout", ("copy", "transpose", "bitcast", "reshape", "pad")),
    ("reductions", ("reduce", "all-reduce", "scatter", "gather")),
    ("fused elementwise (BN/relu/SGD)", ("fusion", "loop")),
)


def bucket_of(name: str) -> str:
    low = name.lower()
    for bucket, keys in BUCKETS:
        if any(k in low for k in keys):
            return bucket
    return "other"


def parse_trace(logdir):
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(
            "no trace.json.gz under {} — the device plugin may not support "
            "tracing over this backend".format(logdir))
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep complete events from device lanes (TensorFlow Op / XLA Ops tracks)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}
    per_bucket, per_op = {}, {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e["dur"])  # microseconds
        total += dur
        per_bucket[bucket_of(name)] = per_bucket.get(bucket_of(name), 0.0) + dur
        key = name.split(".")[0][:60]
        per_op[key] = per_op.get(key, 0.0) + dur
    return total, per_bucket, per_op, sorted(pid_names.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--logdir", default="")
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env, default_params

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", mem_size=1000,
                       batch=args.batch, eps_mem_batch=args.batch,
                       compute_dtype="bf16", verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train(list(range(10)))
    fn = jax.jit(agent._build_train_task_fn(), donate_argnums=0)
    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(args.steps, args.batch, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 10, (args.steps, args.batch)), jnp.int32)

    state, m = fn(state, ctx, xs, ys)  # compile + warm
    np.asarray(m["loss"])

    logdir = args.logdir or tempfile.mkdtemp(prefix="er_trace_")
    t0 = time.time()
    with jax.profiler.trace(logdir):
        state, m = fn(state, ctx, xs, ys)
        np.asarray(m["loss"])
    wall = time.time() - t0
    print("traced {} steps in {:.3f}s ({:.3f} ms/step) -> {}".format(
        args.steps, wall, wall / args.steps * 1e3, logdir))

    total, per_bucket, per_op, tracks = parse_trace(logdir)
    print("trace tracks:", [t for t in tracks if t][:8])
    print("\ndevice-op time by bucket ({:.1f} ms total):".format(total / 1e3))
    for b, d in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print("  {:34s} {:8.2f} ms  {:5.1f}%".format(
            b, d / 1e3, d / total * 100))
    print("\ntop ops:")
    for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:15]:
        print("  {:60s} {:8.2f} ms  {:5.1f}%".format(
            name, d / 1e3, d / total * 100))

    out = {"steps": args.steps, "batch": args.batch,
           "wall_ms_per_step": round(wall / args.steps * 1e3, 3),
           "total_device_ms": round(total / 1e3, 3),
           "buckets_pct": {b: round(d / total * 100, 2)
                           for b, d in per_bucket.items()},
           "top_ops_pct": {n: round(d / total * 100, 2) for n, d in
                           sorted(per_op.items(), key=lambda kv: -kv[1])[:15]}}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "er_b128_trace.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote", path)


if __name__ == "__main__":
    main()
