"""GSS-Greedy buffer update as fused per-sample-gradient kernels.

Reference utils/buffer/gss_greedy_update.py computes one full backward pass
*per incoming sample* in a Python loop (:104-122) plus `gss_mem_strength`
memory-batch backwards. Here per-sample gradients are one `jax.vmap(jax.grad)`
and memory-batch gradients one batched vmap — everything inside the jitted
step. Model runs in eval mode during scoring (the reference calls
model.eval(), :16), so BN uses running statistics and per-sample gradients
are exact.

Replacement semantics match the reference's actual behaviour: candidate slots
are drawn ∝ normalized buffer score (:27-31), and a slot is replaced with
probability b/(s+b) where s=(item_sim+1)/2, b=(slot_score+1)/2 — i.e. the
column-1 outcome of its two-way multinomial (:38-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ocl_tpu.buffer.retrieve import sample_slots
from ocl_tpu.buffer.state import valid_mask, write_slots
from ocl_tpu.models import forward_eval
from ocl_tpu.ops.losses import NEG_INF, cross_entropy


def _cosine_rows(a, b, eps=1e-8):
    """cos(a_i, b_j) for a [N,D], b [M,D] (reference buffer_utils.py:50-55)."""
    na = jnp.linalg.norm(a, axis=1, keepdims=True)
    nb = jnp.linalg.norm(b, axis=1, keepdims=True)
    return (a @ b.T) / jnp.maximum(na * nb.T, eps)


def build_gss_update(agent):
    module = agent.module
    strength = int(agent.params.gss_mem_strength)
    gss_bsz = int(agent.params.gss_batch_size)

    def ce_eval(p, stats, x, y, mask=None):
        return cross_entropy(forward_eval(module, p, stats, x), y, mask=mask)

    def flat_grad(p, stats, x, y, mask=None):
        g = jax.grad(ce_eval)(p, stats, x, y, mask)
        return ravel_pytree(g)[0]

    def mem_grad_bank(p, stats, buf, rng):
        """[strength, D] gradients of random memory batches + row validity."""
        idx, elem_mask = sample_slots(rng, valid_mask(buf), strength * gss_bsz)
        xs = buf.imgs[idx].reshape(strength, gss_bsz, *buf.imgs.shape[1:])
        ys = buf.labels[idx].reshape(strength, gss_bsz)
        ms = elem_mask.reshape(strength, gss_bsz)
        grads = jax.vmap(lambda x, y, m: flat_grad(p, stats, x, y, m))(xs, ys, ms)
        row_valid = jnp.any(ms, axis=1)
        return grads, row_valid

    def per_sample_sims(p, stats, bank, row_valid, x, y):
        """max over bank rows of cosine(bank, grad(sample_i)) -> [B]."""
        g = jax.vmap(lambda xi, yi: flat_grad(p, stats, xi[None], yi[None]))(x, y)
        sim = _cosine_rows(bank, g)  # [strength, B]
        sim = jnp.where(row_valid[:, None], sim, NEG_INF)
        return jnp.max(sim, axis=0)

    def update(p, stats, buf, x, y, rng):
        batch = x.shape[0]
        mem = buf.labels.shape[0]
        r_bank, r_cand, r_coin = jax.random.split(rng, 3)

        def full_branch(buf):
            bank, row_valid = mem_grad_bank(p, stats, buf, r_bank)
            bgrad = flat_grad(p, stats, x, y)
            batch_sim = jnp.max(jnp.where(
                row_valid, _cosine_rows(bank, bgrad[None, :])[:, 0], NEG_INF))

            def do_replace(buf):
                score = buf.score
                w = (score - jnp.min(score)) / (jnp.max(score) - jnp.min(score) + 0.01)
                # weighted sample w/o replacement via Gumbel-top-k on log w
                keys = jnp.log(jnp.maximum(w, 1e-30)) + jax.random.gumbel(r_cand, (mem,))
                _, cand = jax.lax.top_k(keys, batch)
                item_sim = per_sample_sims(p, stats, bank, row_valid, x, y)
                s = (item_sim + 1.0) / 2.0
                b = (score[cand] + 1.0) / 2.0
                repl = jax.random.uniform(r_coin, (batch,)) < b / (s + b)
                new_buf = write_slots(buf, cand, x, y, repl)
                new_score = jnp.where(repl, item_sim,
                                      score[cand])
                return new_buf.replace(score=score.at[cand].set(new_score))

            return jax.lax.cond(batch_sim < 0, do_replace, lambda b_: b_, buf)

        def fill_branch(buf):
            cur = buf.current_index
            offset = jnp.minimum(mem - cur, batch)

            def scored(_):
                bank, row_valid = mem_grad_bank(p, stats, buf, r_bank)
                return per_sample_sims(p, stats, bank, row_valid, x, y)

            scores = jax.lax.cond(cur == 0,
                                  lambda _: jnp.full((batch,), 0.1), scored, None)
            pos = jnp.arange(batch)
            write = pos < offset
            buf2 = write_slots(buf, cur + pos, x, y, write)
            new_score = buf.score.at[jnp.where(write, cur + pos, mem)].set(
                scores, mode="drop")
            return buf2.replace(current_index=cur + offset, score=new_score)

        new_buf = jax.lax.cond(buf.current_index >= mem, full_branch, fill_branch, buf)
        return new_buf, jnp.full((batch,), -1)

    return update
