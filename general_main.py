"""Flag-based CLI (reference general_main.py), TPU/JAX backend."""

from __future__ import annotations

import random

import numpy as np

from ocl_tpu.config import apply_platform_env, build_parser, finalize
from ocl_tpu.experiment.run import multiple_run


def main(args):
    apply_platform_env()
    print(args)
    np.random.seed(args.seed)
    random.seed(args.seed)
    args = finalize(args)
    if getattr(args, "parallel_runs", False):
        from ocl_tpu.experiment.parallel_run import multiple_run_parallel

        multiple_run_parallel(args, store=args.store, save_path=args.save_path)
    else:
        multiple_run(args, store=args.store, save_path=args.save_path)


if __name__ == "__main__":
    main(build_parser().parse_args())
