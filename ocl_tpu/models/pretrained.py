"""Pretrained backbones (reference models/pretrained.py:4-7).

The reference wraps torchvision's ImageNet resnet18 with a replaced fc head;
it is unused by any main training path. Without torchvision, this provides
the same surface: a full-width ResNet-18 whose trunk can be initialized from
a local ``.npz`` of pretrained weights (pytree paths as flat keys), with a
freshly initialized head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.models.resnet import ResNet18


def ResNet18_pretrained(nclasses, weights_npz: str | None = None, rng=None,
                        input_size: int = 224):
    """(module, params, batch_stats) with optional trunk weights from disk.

    The linear head's width depends on the input resolution (the trunk pools
    by a fixed window, reference models/resnet.py:97) — init at the
    resolution you will apply at.
    """
    module = ResNet18(nclasses)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = module.init(rng, jnp.zeros((1, input_size, input_size, 3)),
                            train=True)
    params, stats = variables["params"], variables["batch_stats"]
    if weights_npz:
        flat = dict(np.load(weights_npz))
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        loaded = {}
        for path, leaf in leaves:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            if key in flat and flat[key].shape == leaf.shape:
                loaded[key] = jnp.asarray(flat[key])
        params = jax.tree_util.tree_map_with_path(
            lambda path, leaf: loaded.get(
                "/".join(str(getattr(p, "key", p)) for p in path), leaf),
            params)
    return module, params, stats
