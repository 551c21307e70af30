"""Data streaming: continuum, datasets, test-set device preparation."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ocl_tpu.data.continuum import continuum  # noqa: F401


def prepare_test_loaders(test_data, params):
    """Pad each task's test set to [n_batches, test_batch, ...] device arrays.

    Counterpart of the reference's per-task DataLoaders
    (continuum/data_utils.py:57-64), but materialized once per run and kept
    device-resident: evaluation after every task re-reads them with no
    host->device traffic.
    """
    loaders = []
    bs = params.test_batch
    for x, y in test_data:
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.int64)
        n = x.shape[0]
        nb = max(1, -(-n // bs))
        pad = nb * bs - n
        mask = np.ones(n, bool)
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], np.float32)])
            y = np.concatenate([y, np.zeros(pad, np.int64)])
            mask = np.concatenate([mask, np.zeros(pad, bool)])
        loaders.append((jnp.asarray(x.reshape(nb, bs, *x.shape[1:])),
                        jnp.asarray(y.reshape(nb, bs).astype(np.int32)),
                        jnp.asarray(mask.reshape(nb, bs))))
    return loaders
