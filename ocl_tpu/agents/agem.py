"""Averaged Gradient Episodic Memory.

Reference agents/agem.py: compute the batch gradient g and a reference
gradient g_ref from a random memory sample; when <g, g_ref> < 0, project
g <- g - (<g,g_ref>/||g_ref||^2) g_ref before stepping. The projection is a
tree-level fused op inside the jitted scan (the reference clones per-parameter
grad lists, :63-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.buffer import build_retrieve, build_update
from ocl_tpu.models import forward_train


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


class AGEM(ContinualLearner):
    def __init__(self, params):
        super().__init__(params)
        self.retrieve_fn = build_retrieve(self)
        self.update_fn = build_update(self)

    def _build_train_task_fn(self):
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))
        tx = self.tx
        mem_iters = int(self.params.mem_iters)
        retrieve_fn, update_fn = self.retrieve_fn, self.update_fn

        def loss_fn(p, stats, xb, yb, ctx, agent_state, mask):
            logits, new_stats = forward_train(self.module, p, stats, xb, w=mask)
            loss = self.criterion(logits, yb, ctx, mask)
            loss = self.maybe_kd_blend(loss, logits, xb, ctx, agent_state, mask)
            return loss, (new_stats, logits)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state, ctx, xb, yb):
            params, stats = state.params, state.batch_stats
            opt_state, buf = state.opt_state, state.buffer
            rng = state.rng
            loss_b = acc_b = jnp.zeros(())

            for _ in range(mem_iters):
                rng, r_ret = jax.random.split(rng)
                (loss_b, (stats, logits)), grads = grad_fn(
                    params, stats, xb, yb, ctx, state.agent, None)
                acc_b = jnp.mean((jnp.argmax(logits, 1) == yb).astype(jnp.float32))

                mem_x, mem_y, mem_mask, stats = retrieve_fn(
                    params, stats, buf, xb, yb, grads, r_ret)
                use_mem = (ctx.task_seen > 0) & jnp.any(mem_mask)

                def project(operand):
                    g, st = operand
                    (_, (st2, _)), g_ref = grad_fn(params, st, mem_x, mem_y, ctx,
                                                   state.agent, mem_mask)
                    prod = _tree_dot(g, g_ref)
                    prod_ref = jnp.maximum(_tree_dot(g_ref, g_ref), 1e-12)
                    coef = jnp.where(prod < 0, prod / prod_ref, 0.0)
                    g2 = jax.tree_util.tree_map(lambda a, b: a - coef * b, g, g_ref)
                    return g2, st2

                def keep(operand):
                    return operand

                grads, stats = jax.lax.cond(use_mem, project, keep, (grads, stats))
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

            rng, r_upd = jax.random.split(rng)
            buf, _ = update_fn(params, stats, buf, xb, yb, r_upd)
            new_state = state.replace(params=params, batch_stats=stats,
                                      opt_state=opt_state, buffer=buf, rng=rng)
            return new_state, {"loss": loss_b, "acc": acc_b}

        def train_task_fn(state, ctx, xs, ys):
            return jax.lax.scan(lambda c, i: step(c, ctx, i[0], i[1]),
                                state, (xs, ys), unroll=unroll)

        return train_task_fn

