"""Stateless retrieval primitives over the fixed-shape buffer.

random_retrieve mirrors reference utils/buffer/buffer_utils.py:9-26 (uniform
sample of filled slots without replacement, optional exclusions) via
Gumbel-top-k, returning fixed-size slices plus a validity mask instead of
dynamically-sized tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.buffer.state import BufferState, valid_mask

NEG_INF = -1e30


def sample_slots(rng, eligible, k: int):
    """Uniformly sample up to k True positions of `eligible` w/o replacement.

    Returns (idx [k], mask [k]) — mask[i] is False where fewer than k eligible
    slots existed (those idx entries are arbitrary eligible-or-not positions).
    """
    g = jax.random.gumbel(rng, eligible.shape)
    scores = jnp.where(eligible, g, NEG_INF)
    _, idx = jax.lax.top_k(scores, k)
    n_eligible = jnp.sum(eligible.astype(jnp.int32))
    mask = jnp.arange(k) < n_eligible
    return idx, mask


def random_retrieve(buf: BufferState, num_retrieve: int, rng, excl_mask=None):
    """(x [k,...], y [k], idx [k], mask [k]) uniform over filled slots."""
    eligible = valid_mask(buf)
    if excl_mask is not None:
        eligible = eligible & ~excl_mask
    idx, mask = sample_slots(rng, eligible, num_retrieve)
    return buf.imgs[idx], buf.labels[idx], idx, mask


def class_balanced_sample(buf: BufferState, n_smp_cls: int, rng, excl_mask=None):
    """Up to n_smp_cls uniform samples from each class present in the buffer.

    Reference utils/buffer/buffer_utils.py:92-126 (ClassBalancedRandomSampling
    .sample) walks a host-side {class: set(indices)} cache; here one Gumbel
    top-k per class row over a [C, mem] eligibility matrix does the same
    memory-resident.

    Returns (x [C*n, ...], y [C*n], idx [C*n], mask [C*n]).
    """
    mem = buf.labels.shape[0]
    n_cls = buf.class_counts.shape[0]
    filled = valid_mask(buf)
    if excl_mask is not None:
        filled = filled & ~excl_mask
    # [C, mem] eligibility per class
    elig = (buf.labels[None, :] == jnp.arange(n_cls)[:, None]) & filled[None, :]
    g = jax.random.gumbel(rng, (n_cls, mem))
    scores = jnp.where(elig, g, NEG_INF)
    _, idx = jax.lax.top_k(scores, n_smp_cls)          # [C, n]
    counts = jnp.sum(elig.astype(jnp.int32), axis=1)    # [C]
    mask = jnp.arange(n_smp_cls)[None, :] < counts[:, None]
    idx, mask = idx.reshape(-1), mask.reshape(-1)
    safe_idx = jnp.where(mask, idx, 0)
    return buf.imgs[safe_idx], buf.labels[safe_idx], safe_idx, mask
