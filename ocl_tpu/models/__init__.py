"""Model construction and pure apply helpers.

`setup_architecture` mirrors the reference dispatch (reference:
utils/setup_elements.py:46-68): Reduced ResNet-18 per dataset (the linear head
re-dimensions itself automatically from the pooled feature width here, so no
post-hoc head swap is needed), SupConResNet for SCR, NDPM for CNDPM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.config import input_size_match, n_classes_match
from ocl_tpu.models.resnet import (  # noqa: F401
    Reduced_ResNet18,
    ResNet18,
    ResNet34,
    ResNet50,
    ResNet101,
    ResNet152,
    SupConResNet,
)

# Pooled spatial cells of the Reduced ResNet-18 trunk per input resolution;
# feature dim = cells * nf * 8 -> 160 / 640 / 2560 at nf=20 (reference:
# utils/setup_elements.py:49-66 swaps the torch linear head instead).
POOLED_CELLS = {32: 1, 84: 4, 128: 16, 50: 1}


def feature_dim_for(data: str, nf: int = 20) -> int:
    return POOLED_CELLS[input_size_match[data][0]] * nf * 8


def setup_architecture(params):
    nclass = n_classes_match[params.data]
    nf = getattr(params, "nf", 20)
    if params.agent in ("SCR", "SCP"):
        return SupConResNet(dim_in=feature_dim_for(params.data, nf),
                            head=params.head, nf=nf)
    if params.agent == "CNDPM":
        from ocl_tpu.models.ndpm import build_ndpm

        return build_ndpm(params)
    return Reduced_ResNet18(nclass, nf=nf)


def init_model(module, rng, data: str):
    """Initialize parameters + BN state for a dataset's input shape."""
    shape = tuple(input_size_match[data])
    dummy = jnp.zeros((1,) + shape, jnp.float32)
    variables = module.init(rng, dummy, train=True)
    return variables["params"], variables.get("batch_stats", {})


def forward_train(module, params, batch_stats, x, w=None):
    """Training-mode forward; returns (outputs, updated batch_stats).

    `w` [B] optionally excludes masked rows from the BN batch statistics
    (fixed-shape memory batches carry validity masks)."""
    out, mut = module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=True, w=w, mutable=["batch_stats"])
    return out, mut["batch_stats"]


def forward_eval(module, params, batch_stats, x):
    return module.apply({"params": params, "batch_stats": batch_stats}, x, train=False)


def features_eval(module, params, batch_stats, x):
    """Deep features in eval mode (BN running stats, no mutation)."""
    return module.apply({"params": params, "batch_stats": batch_stats},
                        x, train=False, method="features")


def features_train(module, params, batch_stats, x):
    out, mut = module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=True, mutable=["batch_stats"], method="features")
    return out, mut["batch_stats"]


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
