"""YAML-driven single-config run (reference main_config.py), TPU/JAX backend."""

from __future__ import annotations

import argparse
import random

import numpy as np

from ocl_tpu.config import apply_platform_env, boolean_string, load_yaml, merge_yaml_params
from ocl_tpu.experiment.run import multiple_run


def main(args):
    apply_platform_env()
    general_params = load_yaml(args.general)
    data_params = load_yaml(args.data)
    agent_params = load_yaml(args.agent)
    general_params["verbose"] = args.verbose
    extra = {}
    if args.nf is not None:
        extra["nf"] = args.nf  # repo extension: narrow model for 1-core CPU runs
    final_params = merge_yaml_params(general_params, data_params, agent_params, **extra)
    print(final_params)

    np.random.seed(final_params.seed)
    random.seed(final_params.seed)
    multiple_run(final_params)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("Config-driven Continual Learning (TPU)")
    parser.add_argument("--general", dest="general", default="config/general.yml")
    parser.add_argument("--data", dest="data", default="config/data/cifar100/cifar100_nc.yml")
    parser.add_argument("--agent", dest="agent", default="config/agent/er.yml")
    parser.add_argument("--verbose", type=boolean_string, default=True)
    parser.add_argument("--nf", dest="nf", default=None, type=int,
                        help="override model base width (repo extension)")
    main(parser.parse_args())
