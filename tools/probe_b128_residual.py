"""Decompose the batch-128 bf16 ER step's non-MXU residual (VERDICT r3 #9).

`results/mxu_fill.json` shows the 24.6% MFU at nf=20/batch-128 is a
model-width ceiling (94% at nf=256, same program). This probe names where
the nf=20 time actually goes by timing, at the identical shape
(256 fused rows = batch 128 + eps_mem_batch 128, bf16, nf=20):

  * matmul_sol — one bf16 dense matmul sized to the full step's FLOPs:
                 the device's achievable ceiling for this FLOP count.
  * fwd        — jitted forward + CE loss (convs + BN + elementwise).
  * fwd_bwd    — value_and_grad of the same loss (adds the backward convs,
                 ~2x the forward FLOPs).
  * full       — the production fused ER step (adds buffer retrieve/update,
                 SGD, BN-stats fold, the scan machinery): from
                 bench.bench_stream_agent.

Each row carries its own jaxpr FLOP count and MFU, so the table separates
(a) MXU fill loss intrinsic to 20/40/80/160-channel convs (fwd MFU vs
matmul_sol MFU), (b) backward-pass efficiency (fwd_bwd vs fwd), and
(c) framework overhead (full vs fwd_bwd) — the part ocl_tpu owns.

Run ALONE on the TPU (timing probe):  python tools/probe_b128_residual.py
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _time_scanned(fn, xs, n_iters, reps=3):
    """Median per-iteration ms of fn scanned over xs inside one jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def loop(xs):
        def body(acc, x):
            return acc + fn(x), None

        # unroll like the production task scan (config resolves 4 on TPU) so
        # the comparison against the full step isolates work, not loop
        # bookkeeping
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs, unroll=4)
        return acc

    out = loop(xs)
    np.asarray(out)  # force through the axon tunnel
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(xs))
        times.append((time.perf_counter() - t0) / n_iters * 1e3)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--nf", type=int, default=20)
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from ocl_tpu import models
    from ocl_tpu.config import default_params
    from ocl_tpu.ops.losses import cross_entropy
    from ocl_tpu.utils.flops import estimate_fn_flops

    rows = []

    # --- full production step (fused ER, batch 128 + replay 128) ----------
    full = bench.bench_stream_agent(
        "b128_full_step", args.steps, agent="ER", mem_size=1000, batch=128,
        eps_mem_batch=128, compute_dtype="bf16", nf=args.nf)
    rows.append(dict(segment="full", step_ms=full["step_ms"],
                     flops=full.get("flops_per_step"),
                     mfu_pct=full.get("mfu_pct")))

    # --- forward / forward+backward at the fused 256-row shape ------------
    p = default_params(data="synthetic", verbose=False, agent="ER",
                       batch=128, eps_mem_batch=128, compute_dtype="bf16",
                       nf=args.nf)
    module = models.setup_architecture(p)
    params, batch_stats = models.init_model(
        module, jax.random.PRNGKey(0), "synthetic")
    g = np.random.RandomState(0)
    n_rows = p.batch + p.eps_mem_batch
    xs = jnp.asarray(g.rand(args.steps, n_rows, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 10, (n_rows,)), jnp.int32)

    def loss_fn(params, x):
        logits, _ = models.forward_train(module, params, batch_stats, x)
        return cross_entropy(logits, y)

    fwd = functools.partial(loss_fn, params)
    grad_fn = jax.value_and_grad(loss_fn)

    def fwd_bwd(x):
        l, grads = grad_fn(params, x)
        # fold the grads into the scalar so nothing is dead code
        return l + 0.0 * jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32), grads,
            jnp.zeros((), jnp.float32))

    _, peak = bench.device_peak_flops()
    for name, fn in (("fwd", fwd), ("fwd_bwd", fwd_bwd)):
        ms = _time_scanned(fn, xs, args.steps)
        flops = estimate_fn_flops(fn, xs[0])
        rows.append(dict(segment=name, step_ms=ms, flops=int(flops),
                         mfu_pct=round(100 * flops / (ms / 1e3) / peak, 2)))

    # --- same-FLOPs dense bf16 matmul: the achievable ceiling -------------
    # scanned inside one jit so the axon tunnel's ~28 ms per-call round trip
    # amortizes; iterations rotate over 4 independent inputs (a carry-chained
    # x <- x@b serializes the MXU and measures ~40% slower) and each
    # iteration is one pure matmul plus a scalar-row reduction.
    target = rows[0]["flops"] or rows[-1]["flops"]
    n = int(round((target / 2) ** (1.0 / 3.0) / 128)) * 128  # MXU-aligned
    ms_in = jnp.asarray(g.rand(4, n, n), jnp.bfloat16)
    b = jnp.asarray(g.rand(n, n) * (2.0 / n), jnp.bfloat16)

    @jax.jit
    def loop(idx):
        def body(acc, i):
            out = jnp.dot(ms_in[i % 4], b)
            return acc + jnp.sum(out[0].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return acc

    idx = jnp.arange(args.steps)
    np.asarray(loop(idx))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(idx))
        times.append((time.perf_counter() - t0) / args.steps * 1e3)
    ms = float(np.median(times))
    flops = 2 * n ** 3
    rows.append(dict(segment="matmul_sol_%d^3" % n, step_ms=ms,
                     flops=flops,
                     mfu_pct=round(100 * flops / (ms / 1e3) / peak, 2)))

    print("\n| segment | ms | GFLOP | MFU % |")
    print("|---|---|---|---|")
    for r in rows:
        print("| {} | {:.3f} | {:.1f} | {} |".format(
            r["segment"], r["step_ms"],
            (r["flops"] or 0) / 1e9, r.get("mfu_pct")))

    out = os.path.join(REPO, "results", "b128_residual.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
