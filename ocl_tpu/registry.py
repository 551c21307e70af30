"""Name registries — the framework's extension points.

Mirrors reference utils/name_match.py:23-55. Adding an algorithm means adding
an agent class / buffer strategy and registering the name here.
"""

from __future__ import annotations


def _lazy(path, name):
    def build(*args, **kwargs):
        import importlib

        mod = importlib.import_module(path)
        return getattr(mod, name)(*args, **kwargs)

    return build


data_objects = {
    "cifar100": _lazy("ocl_tpu.data.datasets", "CIFAR100"),
    "cifar10": _lazy("ocl_tpu.data.datasets", "CIFAR10"),
    "core50": _lazy("ocl_tpu.data.datasets", "CORE50"),
    "mini_imagenet": _lazy("ocl_tpu.data.datasets", "Mini_ImageNet"),
    "openloris": _lazy("ocl_tpu.data.datasets", "OpenLORIS"),
    "synthetic": _lazy("ocl_tpu.data.datasets", "Synthetic"),
}

agents = {
    "ER": _lazy("ocl_tpu.agents.er", "ExperienceReplay"),
    "EWC": _lazy("ocl_tpu.agents.ewc_pp", "EWC_pp"),
    "AGEM": _lazy("ocl_tpu.agents.agem", "AGEM"),
    "CNDPM": _lazy("ocl_tpu.agents.cndpm", "Cndpm"),
    "LWF": _lazy("ocl_tpu.agents.lwf", "Lwf"),
    "ICARL": _lazy("ocl_tpu.agents.icarl", "Icarl"),
    "GDUMB": _lazy("ocl_tpu.agents.gdumb", "Gdumb"),
    "SCR": _lazy("ocl_tpu.agents.scr", "SupContrastReplay"),
}

# update/retrieve strategy names are resolved by ocl_tpu.buffer.build_update /
# build_retrieve; listed here for discoverability and validation.
update_methods = ("random", "GSS", "ASER")
retrieve_methods = ("MIR", "random", "ASER", "match", "mem_match")
