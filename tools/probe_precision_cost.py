"""Step-time cost of the f32 matmul-precision modes on the ER hot step.

VERDICT r3 #2: PERFORMANCE.md priced only `highest` (5.75x the ER step).
`high` (bf16x3 passes) is the standard middle point; if it closes most of
the conv-rounding parity drift at ~1.3-2x it becomes the recommended parity
mode. This probe times the identical fused ER train step (Reduced
ResNet-18 nf=20, batch 10, mem 1k — the headline shape) under
default / high / highest via the tracing-scoped jax.default_matmul_precision
context, in one process on the local device.

Run on the TPU:  python tools/probe_precision_cost.py [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    apply_platform_env()
    import jax

    import bench

    rows = {}
    for prec in ("default", "high", "highest"):
        with jax.default_matmul_precision(prec):
            row = bench.bench_stream_agent(
                "er_stream_%s" % prec, args.steps, mem_size=1000, agent="ER",
                batch=10, eps_mem_batch=10, want_flops=False)
        rows[prec] = row
        print(json.dumps(row))
    base = rows["default"]["step_ms"]
    for prec, row in rows.items():
        row["vs_default"] = round(row["step_ms"] / base, 2)
        print("{:8s}: {:6.3f} ms/step ({:.2f}x default)".format(
            prec, row["step_ms"], row["vs_default"]))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "precision_cost.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
