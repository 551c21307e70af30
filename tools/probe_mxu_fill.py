"""Probe: MFU vs backbone width — where does the 26% batch-128 ceiling live?

The reference fixes the Reduced ResNet-18 at nf=20 (models/resnet.py:110 in
/root/reference), so its conv channel counts (20/40/80/160) fill at most a
fraction of the 128x128 MXU tiles; the batch-128 bf16 ER row's ~26% MFU is a
model-shape ceiling, not a framework one. This probe times the identical
fused ER train step at growing widths (everything else fixed: batch 128,
eps_mem_batch 128, compute_dtype bf16) and prints imgs/sec + MFU per width.
If MFU climbs with channel width, the step program (scan + replay + BN +
SGD) is not the bottleneck — the MXU fill is.

Run on the TPU:  python tools/probe_mxu_fill.py [--steps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--widths", type=int, nargs="+", default=[20, 64, 128, 256])
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    apply_platform_env()

    import bench

    rows = []
    missing_mfu = []
    for nf in args.widths:
        row = bench.bench_stream_agent(
            "er_b128_bf16_nf%d" % nf, args.steps, agent="ER", mem_size=1000,
            batch=128, eps_mem_batch=128, compute_dtype="bf16", nf=nf)
        rows.append(row)
        print(json.dumps(row))
        # the probe's whole point is the MFU-vs-width curve; a silently
        # failed FLOPs estimate (bench.bench_stream_agent swallows it)
        # would make mxu_fill.json unusable without saying so
        if "mfu_pct" not in row:
            missing_mfu.append(row["metric"])
            print("WARNING: no mfu_pct for %s (FLOPs estimate failed)"
                  % row["metric"], file=sys.stderr)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "mxu_fill.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)
    if missing_mfu:
        sys.exit("mxu_fill.json is missing mfu_pct for: %s"
                 % ", ".join(missing_mfu))


if __name__ == "__main__":
    main()
