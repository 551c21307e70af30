"""Class-matched retrieval (match / mem_match).

Reference utils/buffer/sc_retrieve.py + mem_match.py + buffer_utils.py:29-48:
after a warmup of `warmup * eps_mem_batch` seen samples, retrieve one buffered
sample of the same class for every (candidate) label, without replacement
within a class; if any class lacks enough exemplars the whole retrieval
returns empty (here: an all-False mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.buffer.retrieve import random_retrieve
from ocl_tpu.buffer.state import valid_mask
from ocl_tpu.ops.losses import NEG_INF


def match_labels(buf, n_classes: int, want_y, rng, excl_mask=None):
    """One distinct same-class buffer index per entry of want_y.

    Returns (idx [B], ok scalar bool) — ok is False if any class in want_y
    has fewer exemplars than its multiplicity (reference buffer_utils.py:37-41
    returns empty tensors in that case).
    """
    mem = buf.labels.shape[0]
    batch = want_y.shape[0]
    filled = valid_mask(buf)
    if excl_mask is not None:
        filled = filled & ~excl_mask
    elig = (buf.labels[None, :] == jnp.arange(n_classes)[:, None]) & filled[None, :]
    g = jax.random.gumbel(rng, (n_classes, mem))
    _, per_class = jax.lax.top_k(jnp.where(elig, g, NEG_INF), batch)  # [C, B]

    onehot = jax.nn.one_hot(want_y, n_classes, dtype=jnp.int32)
    occ_rank = jnp.cumsum(onehot, axis=0) - onehot  # rank of i within its class
    rank = occ_rank[jnp.arange(batch), want_y]
    idx = per_class[want_y, rank]

    avail = jnp.sum(elig.astype(jnp.int32), axis=1)
    need = jnp.sum(onehot, axis=0)
    ok = jnp.all(avail >= need)
    return idx, ok


def build_match_retrieve(agent):
    from ocl_tpu.config import n_classes_match

    n_classes = n_classes_match[agent.params.data]
    num_retrieve = int(agent.params.eps_mem_batch)
    warmup = int(agent.params.warmup)

    def retrieve(p, stats, buf, x, y, grads, rng):
        idx, ok = match_labels(buf, n_classes, y, rng)
        warm = buf.n_seen_so_far > num_retrieve * warmup
        mask = jnp.full(y.shape, ok & warm)
        return buf.imgs[idx], buf.labels[idx], mask, stats

    return retrieve


def build_mem_match_retrieve(agent):
    """mem_match (reference mem_match.py): random candidates + class-matched
    partners. The agent-facing triple carries the concatenated pair; the full
    4-tuple is available via `mem_match_pairs` for library use."""
    from ocl_tpu.config import n_classes_match

    n_classes = n_classes_match[agent.params.data]
    num_retrieve = int(agent.params.eps_mem_batch)
    warmup = int(agent.params.warmup)

    def retrieve(p, stats, buf, x, y, grads, rng):
        r1, r2 = jax.random.split(rng)
        cx, cy, cidx, cmask = random_retrieve(buf, num_retrieve, r1)
        excl = jnp.zeros(buf.labels.shape[0], bool).at[
            jnp.where(cmask, cidx, buf.labels.shape[0])].set(True, mode="drop")
        midx, ok = match_labels(buf, n_classes, cy, r2, excl_mask=excl)
        warm = buf.n_seen_so_far > num_retrieve * warmup
        mask = cmask & ok & warm
        mem_x = jnp.concatenate([cx, buf.imgs[midx]])
        mem_y = jnp.concatenate([cy, buf.labels[midx]])
        return mem_x, mem_y, jnp.concatenate([mask, mask]), stats

    return retrieve
