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
    cdt = getattr(params, "compute_dtype", "fp32") or "fp32"
    if params.agent in ("SCR", "SCP"):
        return SupConResNet(dim_in=feature_dim_for(params.data, nf),
                            head=params.head, nf=nf, compute_dtype=cdt)
    if params.agent == "CNDPM":
        from ocl_tpu.models.ndpm import build_ndpm

        return build_ndpm(params)
    return Reduced_ResNet18(nclass, nf=nf, compute_dtype=cdt)


def init_model(module, rng, data: str):
    """Initialize parameters + BN state for a dataset's input shape."""
    shape = tuple(input_size_match[data])
    dummy = jnp.zeros((1,) + shape, jnp.float32)
    variables = module.init(rng, dummy, train=True)
    return variables["params"], variables.get("batch_stats", {})


def _policy_in(module, params, x):
    """Apply the module's compute policy at the apply boundary: under bf16,
    cast floating params + inputs so convs/matmuls run MXU-native. Gradients
    flow through the cast, so optimizer math stays f32."""
    if getattr(module, "compute_dtype", "fp32") == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        x = x.astype(jnp.bfloat16)
    return params, x


def _policy_out(module, out):
    if getattr(module, "compute_dtype", "fp32") == "bf16":
        out = out.astype(jnp.float32)
    return out


def forward_train(module, params, batch_stats, x, w=None):
    """Training-mode forward; returns (outputs, updated batch_stats).

    `w` [B] optionally excludes masked rows from the BN batch statistics
    (fixed-shape memory batches carry validity masks)."""
    params, x = _policy_in(module, params, x)
    out, mut = module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=True, w=w, mutable=["batch_stats"])
    return _policy_out(module, out), mut["batch_stats"]


def forward_eval(module, params, batch_stats, x):
    params, x = _policy_in(module, params, x)
    return _policy_out(module, module.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))


def forward_teacher(module, params, batch_stats, x, w=None):
    """Teacher / previous-model logits for distillation.

    The reference deepcopies its teacher while the model is still in train
    mode and never switches it to eval (agents/base.py:91, agents/icarl.py:31
    + kd_manager.py:22-25), so teacher forwards normalize BN by the *current
    batch's* statistics, not the stored running stats. Reproduce that:
    train-mode apply, stat updates discarded, no gradients."""
    params, x = _policy_in(module, params, x)
    out, _ = module.apply({"params": params, "batch_stats": batch_stats},
                          x, train=True, w=w, mutable=["batch_stats"])
    return jax.lax.stop_gradient(_policy_out(module, out))


def features_eval(module, params, batch_stats, x):
    """Deep features in eval mode (BN running stats, no mutation)."""
    params, x = _policy_in(module, params, x)
    return _policy_out(module, module.apply(
        {"params": params, "batch_stats": batch_stats},
        x, train=False, method="features"))


def features_train(module, params, batch_stats, x):
    params, x = _policy_in(module, params, x)
    out, mut = module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=True, mutable=["batch_stats"], method="features")
    return _policy_out(module, out), mut["batch_stats"]


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
