"""GSS-Greedy buffer update as fused per-sample-gradient kernels.

Reference utils/buffer/gss_greedy_update.py computes one full backward pass
*per incoming sample* in a Python loop (:104-122) plus `gss_mem_strength`
memory-batch backwards. Here per-sample gradients are one `jax.vmap(jax.grad)`
and memory-batch gradients one batched vmap — everything inside the jitted
step. Model runs in eval mode during scoring (the reference calls
model.eval(), :16), so BN uses running statistics and per-sample gradients
are exact.

The replacement gate (reference :25, ``batch_sim < 0``) only needs the SIGN
of max_i cos(bank_i, batch_grad), which equals the sign of
max_i <grad(L_i), batch_grad> — and those dot products are directional
derivatives, computable with ONE forward-mode `jax.jvp` of the per-bank-batch
loss vector in the batch-grad direction, without materializing the
[strength, D] gradient bank at all. The bank (the dominant cost: XLA lowers
the shared-weight vmap(grad) to per-group weight-grad convolutions, measured
~4x its pure-compute bound — docs/PERFORMANCE.md) is materialized only
inside the replace branch of a `lax.cond`, mirroring the reference's own
`if batch_sim < 0` control flow, so non-replacing steps skip it entirely.

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
    # The bank's vmap(grad) with SHARED weights lowers nn.Conv weight-grads
    # to grouped convolutions, measured ~3.9x over their pure-compute bound
    # (docs/PERFORMANCE.md). The one previously-unexplored alternative — an
    # im2col re-lowering (models.layers.PatchConv: conv as patches @ W, so
    # the vmapped weight-grad becomes one batched MXU matmul per layer) —
    # was built and measured WORSE: 8.09 vs 4.39 ms/bank on the v5e
    # (tools/probe_gss_im2col.py; nf=20 gives K<=180, N<=160 matmuls that
    # fill the MXU worse than the grouped convs do). The grouped-conv
    # lowering stays; the jvp gate below remains the win that matters.

    def ce_eval(p, stats, x, y, mask=None):
        return cross_entropy(forward_eval(module, p, stats, x), y, mask=mask)

    def flat_grad(p, stats, x, y, mask=None):
        g = jax.grad(ce_eval)(p, stats, x, y, mask)
        return ravel_pytree(g)[0]

    def sample_bank_batches(buf, rng):
        """The strength random memory batches the bank is built from."""
        idx, elem_mask = sample_slots(rng, valid_mask(buf), strength * gss_bsz)
        xs = buf.imgs[idx].reshape(strength, gss_bsz, *buf.imgs.shape[1:])
        ys = buf.labels[idx].reshape(strength, gss_bsz)
        ms = elem_mask.reshape(strength, gss_bsz)
        return xs, ys, ms, jnp.any(ms, axis=1)

    def mem_grad_bank(p, stats, xs, ys, ms):
        """[strength, D] gradients of the sampled memory batches."""
        return jax.vmap(lambda x, y, m: flat_grad(p, stats, x, y, m))(xs, ys, ms)

    def bank_dots(p, stats, xs, ys, ms, direction):
        """<grad(L_i), direction> for each bank batch i, via one jvp
        (direction is a params-structured pytree)."""
        def losses(pp):
            return jax.vmap(lambda x, y, m: ce_eval(pp, stats, x, y, m))(
                xs, ys, ms)

        _, dots = jax.jvp(losses, (p,), (direction,))
        return dots

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
            xs, ys, ms, row_valid = sample_bank_batches(buf, r_bank)
            bgrad_tree = jax.grad(ce_eval)(p, stats, x, y)
            # sign(max cosine) == sign(max dot): the gate needs no bank
            dots = bank_dots(p, stats, xs, ys, ms, bgrad_tree)
            batch_sim = jnp.max(jnp.where(row_valid, dots, NEG_INF))

            def do_replace(buf):
                bank = mem_grad_bank(p, stats, xs, ys, ms)
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
                xs, ys, ms, row_valid = sample_bank_batches(buf, r_bank)
                bank = mem_grad_bank(p, stats, xs, ys, ms)
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

    # internals exposed for the gate-equivalence test (test_strategies.py)
    update.sample_bank_batches = sample_bank_batches
    update.mem_grad_bank = mem_grad_bank
    update.bank_dots = bank_dots
    update.flat_grad = flat_grad
    update.ce_eval = ce_eval
    return update
