"""Maximally Interfered Retrieval, functionally.

Reference utils/buffer/mir_retrieve.py:15-47 deep-copies the model and applies
one virtual SGD step to score a random subsample by loss increase. Here the
virtual step is a tree_map (no copy), and the two scoring forwards are batched
eval passes — the natural JAX formulation.

The reference's scoring forwards run with BN in train mode under no_grad,
which *mutates* the live model's running statistics as a side effect
(mir_retrieve.py:23-27: the pre forward is on the live model, the post
forward on the discarded copy). Reproduced here: the pre-scoring
forward_train's updated stats are returned and threaded back into the step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.buffer.retrieve import random_retrieve
from ocl_tpu.models import forward_train
from ocl_tpu.ops.losses import NEG_INF


def build_mir_retrieve(agent):
    module = agent.module
    lr = agent.params.learning_rate
    subsample = agent.params.subsample
    k = agent.params.eps_mem_batch

    def retrieve(params, stats, buf, x, y, grads, rng):
        sub_x, sub_y, _, sub_mask = random_retrieve(buf, subsample, rng)
        virtual = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)

        # pre forward on the live model folds the subsample's batch stats
        # into the running stats (only when the subsample is non-empty,
        # matching the reference's sub_x.size(0) > 0 guard)
        logits_pre, stats_after = forward_train(module, params, stats, sub_x,
                                                w=sub_mask)
        has_any = jnp.any(sub_mask)
        stats_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(has_any, new, old), stats_after, stats)
        # same mask on the post forward: both scoring passes must normalize
        # with statistics of the same (valid) rows or the score measures the
        # normalization shift instead of interference
        logits_post, _ = forward_train(module, virtual, stats, sub_x,
                                       w=sub_mask)
        nll = lambda lg: -jnp.take_along_axis(  # noqa: E731
            jax.nn.log_softmax(lg, axis=-1), sub_y[:, None], axis=1)[:, 0]
        scores = nll(logits_post) - nll(logits_pre)

        scores = jnp.where(sub_mask, scores, NEG_INF)
        _, top_idx = jax.lax.top_k(scores, k)
        n_valid = jnp.sum(sub_mask.astype(jnp.int32))
        mem_mask = jnp.arange(k) < jnp.minimum(k, n_valid)
        return sub_x[top_idx], sub_y[top_idx], mem_mask, stats_out

    return retrieve
