"""Localize the ER-family parity drift (+2.3 +/- 1.9 pt, PARITY.md).

PARITY_RESULTS.md shows a small systematic POSITIVE Delta(acc) across the
ER/rehearsal family (ER +0.023, ER_REVIEW +0.036, SCR_REVIEW +0.033). The
remaining un-ablated numeric difference between the two frameworks is conv
arithmetic: the parity runs execute the ocl side on the TPU, where JAX's
DEFAULT precision computes f32 convolutions with truncated-mantissa
(bfloat16) passes on the MXU, while the torch reference runs exact f32 on
CPU.

This probe re-runs the ocl ER side seed-paired against the SAME cached
torch matrices under arithmetic variants:

  * tpu_default  — as published (cached; DEFAULT precision)
  * tpu_highest  — jax_default_matmul_precision=highest (f32-equivalent
                   multi-pass convs on the MXU)
  * tpu_high     — jax_default_matmul_precision=high (bf16x3 passes; the
                   standard middle point, 3.41x the DEFAULT ER step)
  * cpu_f32      — XLA:CPU, exact f32 (slow: full-width nf=20 CPU
                   compile, ~6 min/seed on the 1-core host)

If Delta(acc) collapses toward 0 under tpu_highest/cpu_f32, the drift is
named: MXU default-precision convs act as a (mildly beneficial) noise
source at batch 10. If it persists, precision is exonerated and the
residual is framework-level training dynamics (documented in PARITY.md).

Usage:  python tools/probe_er_drift.py --seeds 10 [--variants tpu_highest]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import parity_vs_reference as P  # noqa: E402


def variant_key(variant, cfg, seed, args):
    """Content-addressed path for a probe-variant ocl matrix."""
    base = os.path.basename(P._cache_key("ocl", cfg, seed, args))
    return os.path.join(P.RAW_DIR, "probe_{}_{}".format(variant, base))


def run_variant(variant, cfg, seeds, args):
    import jax

    if variant == "tpu_highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    elif variant == "tpu_high":
        jax.config.update("jax_default_matmul_precision", "high")
    mats = []
    stream_cache = {}
    for seed in seeds:
        path = variant_key(variant, cfg, seed, args)
        mat = P._cached(path)
        if mat is None:
            if seed not in stream_cache:
                stream_cache.clear()
                stream_cache[seed] = P.make_stream(
                    seed + 1, args.per_class, args.difficulty, args.num_tasks)
            tasks, tests = stream_cache[seed]
            mat = P.run_ocl_side(cfg, tasks, tests, seed, args)
            P._store(path, mat)
            print("  [{} seed {}] end_acc {:.3f}".format(
                variant, seed, mat[-1].mean()), flush=True)
        mats.append(mat)
    return mats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--agent", default="ER", choices=list(P.AGENT_CONFIGS))
    ap.add_argument("--variants", nargs="+",
                    default=["tpu_highest"],
                    choices=["tpu_highest", "tpu_high", "cpu_f32"])
    ap.add_argument("--per_class", type=int, default=100)
    ap.add_argument("--difficulty", type=float, default=0.85)
    ap.add_argument("--num_tasks", type=int, default=5)
    ap.add_argument("--mem_size", type=int, default=500)
    ap.add_argument("--eps_mem_batch", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--nf", type=int, default=20)
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    if "cpu_f32" in args.variants:
        os.environ["JAX_PLATFORMS"] = "cpu"
    apply_platform_env()

    cfg = P.AGENT_CONFIGS[args.agent]
    seeds = list(range(args.seeds))

    # torch side + published ocl side: must already be cached by the main
    # parity sweep (this probe never re-runs torch).
    ref_mats, ocl_default = [], []
    for seed in seeds:
        ref = P._cached(P._cache_key("ref", cfg, seed, args))
        ocl = P._cached(P._cache_key("ocl", cfg, seed, args))
        if ref is None or ocl is None:
            sys.exit("missing cached parity run for seed {} — run "
                     "tools/parity_vs_reference.py first".format(seed))
        ref_mats.append(ref)
        ocl_default.append(ocl)

    rows = {"tpu_default": P.paired_stats(ref_mats, ocl_default)}
    for variant in args.variants:
        mats = run_variant(variant, cfg, seeds, args)
        rows[variant] = P.paired_stats(ref_mats, mats)

    print()
    print("| variant | ocl acc | d_acc +/- CI | d_fgt +/- CI |")
    print("|---|---|---|---|")
    for name, s in rows.items():
        print("| {} | {:.3f} | {:+.3f} +/- {:.3f} | {:+.3f} +/- {:.3f} |"
              .format(name, s["ocl_acc"], s["d_acc"], s["d_acc_ci95"],
                      s["d_fgt"], s["d_fgt_ci95"]))
    out = os.path.join(REPO, "results", "er_drift_probe.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing[args.agent] = rows
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
