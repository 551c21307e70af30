"""Result persistence + process introspection (reference utils/io.py)."""

from __future__ import annotations

import os

import yaml


def load_yaml(path, key="parameters"):
    with open(path, "r") as stream:
        return yaml.load(stream, Loader=yaml.FullLoader)[key]


def save_dataframe_csv(df, path, name):
    df.to_csv(os.path.join(path, name), index=False)


def check_ram_usage():
    """RSS of the current process in MB."""
    import psutil

    process = psutil.Process(os.getpid())
    return process.memory_info().rss / (1024 * 1024)
