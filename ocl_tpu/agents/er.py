"""Experience Replay (also hosts MIR/GSS/ASER via strategy flags).

Reference: agents/exp_replay.py. The per-batch loop
(forward/backward on incoming batch -> retrieve -> forward/backward on memory
-> optimizer step -> buffer update) becomes one pure `step`, scanned over the
whole task on device. In ASER mode the optimizer steps on a combined
memory+batch loss instead (reference agents/exp_replay.py:79-89); XLA
dead-code-eliminates the unused batch/memory backward passes automatically
while keeping their BN-statistics updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.buffer import build_retrieve, build_update
from ocl_tpu.models import forward_train


class ExperienceReplay(ContinualLearner):
    def __init__(self, params):
        super().__init__(params)
        self.retrieve_fn = build_retrieve(self)
        self.update_fn = build_update(self)
        self.aser_mode = params.update == "ASER" or params.retrieve == "ASER"

    def _build_train_task(self):
        return jax.jit(self._build_train_task_fn(), donate_argnums=0)

    def _build_train_task_fn(self):
        module, tx = self.module, self.tx
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))
        mem_iters = int(self.params.mem_iters)
        retrieve_fn, update_fn = self.retrieve_fn, self.update_fn
        aser_mode = self.aser_mode
        # fused replay: one forward/backward over [batch; memory] instead of
        # two sequential ones. Same summed loss and gradients up to BN
        # coupling (one combined masked statistic fold vs the reference's two
        # sequential folds) — opt-in, and only where retrieval does not need
        # the batch gradients first.
        fused = bool(getattr(self.params, "fused_replay", False)) and \
            not aser_mode and self.params.retrieve in ("random", "match")

        def loss_fn(params, stats, xb, yb, ctx, agent_state, mask):
            logits, new_stats = forward_train(module, params, stats, xb, w=mask)
            loss = self.criterion(logits, yb, ctx, mask)
            loss = self.maybe_kd_blend(loss, logits, xb, ctx, agent_state, mask)
            return loss, (new_stats, logits)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def fused_loss_fn(params, stats, xb, yb, mem_x, mem_y, mem_mask, ctx,
                          agent_state):
            batch = xb.shape[0]
            comb_x = jnp.concatenate([xb, mem_x])
            comb_y = jnp.concatenate([yb, mem_y])
            comb_mask = jnp.concatenate([jnp.ones(yb.shape, bool), mem_mask])
            logits, new_stats = forward_train(module, params, stats, comb_x,
                                              w=comb_mask)
            loss_b = self.criterion(logits[:batch], yb, ctx)
            loss_b = self.maybe_kd_blend(loss_b, logits[:batch], xb, ctx,
                                         agent_state)
            loss_m = self.criterion(logits[batch:], mem_y, ctx, mem_mask)
            loss_m = jnp.where(jnp.any(mem_mask), loss_m, 0.0)
            return loss_b + loss_m, (new_stats, logits[:batch], loss_b)

        fused_grad_fn = jax.value_and_grad(fused_loss_fn, has_aux=True)

        def step(state, ctx, xb, yb):
            params, stats = state.params, state.batch_stats
            opt_state, buf = state.opt_state, state.buffer
            rng = state.rng
            loss_b = acc_b = jnp.zeros(())

            if fused:
                for _ in range(mem_iters):
                    rng, r_ret = jax.random.split(rng)
                    mem_x, mem_y, mem_mask, stats = retrieve_fn(
                        params, stats, buf, xb, yb, None, r_ret)
                    (_, (stats, logits_b, loss_b)), grads = fused_grad_fn(
                        params, stats, xb, yb, mem_x, mem_y, mem_mask, ctx,
                        state.agent)
                    acc_b = jnp.mean(
                        (jnp.argmax(logits_b, 1) == yb).astype(jnp.float32))
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                rng, r_upd = jax.random.split(rng)
                buf, _ = update_fn(params, stats, buf, xb, yb, r_upd)
                new_state = state.replace(params=params, batch_stats=stats,
                                          opt_state=opt_state, buffer=buf, rng=rng)
                return new_state, {"loss": loss_b, "acc": acc_b}

            for _ in range(mem_iters):
                rng, r_ret, r_mem = jax.random.split(rng, 3)
                (loss_b, (stats, logits_b)), grads_b = grad_fn(
                    params, stats, xb, yb, ctx, state.agent, None)
                acc_b = jnp.mean((jnp.argmax(logits_b, 1) == yb).astype(jnp.float32))

                # MIR's pre-scoring forward folds the subsample's BN stats
                # into the live running stats (reference mir_retrieve.py:23)
                mem_x, mem_y, mem_mask, stats = retrieve_fn(
                    params, stats, buf, xb, yb, grads_b, r_ret)
                has_mem = jnp.any(mem_mask)

                def with_mem(operand):
                    p, st = operand
                    (_, (st2, _)), g = grad_fn(p, st, mem_x, mem_y, ctx,
                                               state.agent, mem_mask)
                    return st2, g

                def no_mem(operand):
                    _, st = operand
                    return st, jax.tree_util.tree_map(jnp.zeros_like, grads_b)

                stats, grads_m = jax.lax.cond(has_mem, with_mem, no_mem, (params, stats))

                if aser_mode:
                    comb_x = jnp.concatenate([mem_x, xb])
                    comb_y = jnp.concatenate([mem_y, yb])
                    comb_mask = jnp.concatenate(
                        [mem_mask, jnp.ones(yb.shape, bool)])
                    (_, (stats, _)), grads = grad_fn(params, stats, comb_x, comb_y,
                                                     ctx, state.agent, comb_mask)
                else:
                    grads = jax.tree_util.tree_map(jnp.add, grads_b, grads_m)

                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

            rng, r_upd = jax.random.split(rng)
            buf, _ = update_fn(params, stats, buf, xb, yb, r_upd)
            new_state = state.replace(params=params, batch_stats=stats,
                                      opt_state=opt_state, buffer=buf, rng=rng)
            return new_state, {"loss": loss_b, "acc": acc_b}

        def train_task_fn(state, ctx, xs, ys):
            def body(carry, inp):
                return step(carry, ctx, inp[0], inp[1])

            return jax.lax.scan(body, state, (xs, ys), unroll=unroll)

        return train_task_fn

