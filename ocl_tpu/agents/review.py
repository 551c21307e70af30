"""review_trick: one epoch of memory replay at grads/10 after each task.

Reference agents/base.py:62-88: iterate the filled buffer in eps_mem_batch
batches (shuffled, drop_last), scale gradients by 1/10, optimizer step. SCR
agents override the loss with the two-view SupCon objective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def review_pass(agent, state, ctx):
    n = int(state.buffer.current_index)
    bs = agent.params.eps_mem_batch
    n_batches = n // bs
    if n_batches == 0:
        return state

    rng, perm_rng = jax.random.split(state.rng)
    perm = np.asarray(jax.random.permutation(perm_rng, n))
    idx = jnp.asarray(perm[: n_batches * bs].reshape(n_batches, bs))
    state = state.replace(rng=rng)

    run = agent._eval_cache.get("review")
    if run is None:
        tx = agent.tx

        @jax.jit
        def run(state, ctx, idx):
            buf = state.buffer

            def review_step(carry, idxb):
                params, stats, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                xb, yb = buf.imgs[idxb], buf.labels[idxb]
                loss, grads, stats = agent.review_loss(params, stats, xb, yb, ctx, sub)
                grads = jax.tree_util.tree_map(lambda g: g / 10.0, grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, stats, opt_state, rng), loss

            init = (state.params, state.batch_stats, state.opt_state, state.rng)
            (params, stats, opt_state, rng), _ = jax.lax.scan(review_step, init, idx)
            return state.replace(params=params, batch_stats=stats,
                                 opt_state=opt_state, rng=rng)

        agent._eval_cache["review"] = run
    return run(state, ctx, idx)
