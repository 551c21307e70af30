"""KNN Shapley values over deep features, fully batched and mask-aware.

Reference utils/buffer/aser_utils.py:7-61: pairwise (squared-euclidean)
distances eval x cand, per-row distance argsort, indicator/factor recursion,
reverse cumulative sum scattered back to candidate order. Here the whole
pipeline is one jitted fn on fixed shapes: invalid candidates sort to the end
with +inf distance and zero indicator, and the recursion's position factors
use the *valid* candidate count, so masked rows/columns reproduce the
reference's dynamic-shape result exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def knn_sv(eval_feats, eval_y, eval_mask, cand_feats, cand_y, cand_mask, k: int):
    """SV matrix [n_eval, n_cand]; rows of invalid evals are zero.

    Features should be deep features (eval-mode forward); distances are
    squared euclidean (monotone equivalent to the reference's, aser_utils.py
    :94-116).
    """
    from ocl_tpu.ops.pallas.distance import pairwise_sqdist

    n_eval, n_cand = eval_feats.shape[0], cand_feats.shape[0]
    n_valid = jnp.sum(cand_mask.astype(jnp.int32))

    d = pairwise_sqdist(eval_feats, cand_feats)
    d = jnp.where(cand_mask[None, :], d, jnp.inf)
    sorted_ind = jnp.argsort(d, axis=1)                       # [n_eval, n_cand]

    cl = jnp.where(cand_mask, cand_y, -1)[sorted_ind]
    indicator = (eval_y[:, None] == cl).astype(jnp.float32)
    indicator_next = jnp.concatenate(
        [indicator[:, 1:], jnp.zeros((n_eval, 1), jnp.float32)], axis=1)
    diff = indicator - indicator_next

    pos = jnp.arange(n_cand)
    j1 = (pos + 1).astype(jnp.float32)
    last = pos == n_valid - 1
    denom = j1 * jnp.where(last, 1.0, float(k))
    numer = jnp.where(last, 1.0, jnp.where(pos >= k, float(k), j1))
    factor = numer / denom

    rc = jnp.flip(jnp.cumsum(jnp.flip(diff * factor, axis=1), axis=1), axis=1)
    rows = jnp.arange(n_eval)[:, None]
    sv = jnp.zeros((n_eval, n_cand), jnp.float32).at[rows, sorted_ind].set(rc)
    sv = jnp.where(eval_mask[:, None], sv, 0.0)
    return sv


def masked_mean(sv, eval_mask):
    """Mean over valid eval rows -> [n_cand]."""
    n = jnp.maximum(jnp.sum(eval_mask.astype(jnp.float32)), 1.0)
    return jnp.sum(sv, axis=0) / n


def masked_max(sv, eval_mask):
    return jnp.max(jnp.where(eval_mask[:, None], sv, -jnp.inf), axis=0)


def masked_min(sv, eval_mask):
    return jnp.min(jnp.where(eval_mask[:, None], sv, jnp.inf), axis=0)
