"""YAML-driven tuning CLI (reference main_tune.py), TPU/JAX backend."""

from __future__ import annotations

import argparse
import random

import numpy as np

from ocl_tpu.config import apply_platform_env, DEFAULT_TRICK, boolean_string, load_yaml, merge_yaml_params
from ocl_tpu.experiment.tune import multiple_run_tune_separate


def main(args):
    apply_platform_env()
    general_params = load_yaml(args.general)
    data_params = load_yaml(args.data)
    default_params = load_yaml(args.default)
    tune_params = load_yaml(args.tune)
    general_params["verbose"] = args.verbose
    general_params["train_val"] = args.train_val
    trick = dict(DEFAULT_TRICK)
    if args.trick:
        trick[args.trick] = True
    general_params["trick"] = trick
    final_default_params = merge_yaml_params(general_params, data_params, default_params)
    print(final_default_params)

    np.random.seed(final_default_params.seed)
    random.seed(final_default_params.seed)
    multiple_run_tune_separate(final_default_params, tune_params, args.save_path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("Continual Learning (TPU)")
    parser.add_argument("--general", dest="general", default="config/general_1.yml")
    parser.add_argument("--data", dest="data", default="config/data/cifar100/cifar100_nc.yml")
    parser.add_argument("--default", dest="default", default="config/agent/er/er_1k.yml")
    parser.add_argument("--tune", dest="tune", default="config/agent/er/er_tune.yml")
    parser.add_argument("--save-path", dest="save_path", default=None)
    parser.add_argument("--verbose", type=boolean_string, default=False)
    parser.add_argument("--train_val", type=boolean_string, default=False)
    parser.add_argument("--trick", type=str, default=None)
    main(parser.parse_args())
