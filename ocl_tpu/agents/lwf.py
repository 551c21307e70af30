"""Learning without Forgetting.

Reference agents/lwf.py: loss = 1/(t+1) * CE + (1 - 1/(t+1)) * KD against the
previous task's snapshot (the teacher pytree replaces the reference's model
deepcopy, kd_manager.py:18-19). No memory buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.models import forward_teacher, forward_train
from ocl_tpu.ops.losses import kd_loss


class Lwf(ContinualLearner):
    uses_buffer = False

    def _build_train_task_fn(self):
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))
        tx = self.tx

        def loss_fn(p, stats, xb, yb, ctx, agent_state):
            logits, new_stats = forward_train(self.module, p, stats, xb)
            loss_new = self.criterion(logits, yb, ctx)
            # train-mode teacher (batch-stat BN): the reference's deepcopied
            # teacher is never switched to eval (kd_manager.py:22-25)
            teacher_logits = forward_teacher(
                self.module, agent_state["teacher_params"],
                agent_state["teacher_stats"], xb)
            loss_old = kd_loss(logits, teacher_logits) * agent_state["has_teacher"]
            t = ctx.task_seen.astype(jnp.float32) + 1.0
            loss = (1.0 / t) * loss_new + (1.0 - 1.0 / t) * loss_old
            return loss, (new_stats, logits)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state, ctx, xb, yb):
            (loss, (stats, logits)), grads = grad_fn(
                state.params, state.batch_stats, xb, yb, ctx, state.agent)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            acc = jnp.mean((jnp.argmax(logits, 1) == yb).astype(jnp.float32))
            return state.replace(params=params, batch_stats=stats,
                                 opt_state=opt_state), {"loss": loss, "acc": acc}

        def train_task_fn(state, ctx, xs, ys):
            return jax.lax.scan(lambda c, i: step(c, ctx, i[0], i[1]),
                                state, (xs, ys), unroll=unroll)

        return train_task_fn

    def __init__(self, params):
        super().__init__(params)
        self.needs_kd = True

    def init_agent_state(self, model_params, batch_stats):
        from ocl_tpu.utils.meters import tree_copy

        return {"teacher_params": tree_copy(model_params),
                "teacher_stats": tree_copy(batch_stats),
                "has_teacher": jnp.zeros((), jnp.float32)}

