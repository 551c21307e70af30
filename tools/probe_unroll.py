"""Probe: headline ER step time vs --scan_unroll on this chip.

The default unroll is 4 on TPU (config.py; ADVICE r2 made it 1 on CPU).
This times the exact headline bench config (ER fused, bs 10, mem 1000,
500-step scan) at several unroll factors to check whether the default
still sits at the knee on the current host/toolchain.

Run on the TPU:  python tools/probe_unroll.py [--unrolls 1 4 8 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--steps", type=int, default=500)
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    apply_platform_env()

    import bench

    for u in args.unrolls:
        row = bench.bench_stream_agent(
            "er_unroll%d" % u, args.steps, agent="ER", mem_size=1000,
            batch=10, eps_mem_batch=10, scan_unroll=u, want_flops=False)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
