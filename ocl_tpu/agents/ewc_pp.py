"""Online EWC (EWC++).

Reference agents/ewc_pp.py: per step, accumulate squared gradients into a
temporary Fisher; every `fisher_update_after` steps fold them into the running
Fisher with an EMA; penalize lambda * sum(F_norm * (theta - theta*)^2); after
each task snapshot parameters and min-max-normalize the running Fisher. All
Fisher pytrees live in the agent state and update as tree_maps inside the
jitted scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.models import forward_train


class EWC_pp(ContinualLearner):
    uses_buffer = False

    def __init__(self, params):
        super().__init__(params)
        self.lambda_ = float(params.lambda_)
        self.alpha = float(params.alpha)
        self.fua = int(params.fisher_update_after)

    def init_agent_state(self, model_params, batch_stats):
        from ocl_tpu.utils.meters import tree_copy

        def zeros():
            # independent buffers: aliased leaves break donated execution
            return jax.tree_util.tree_map(jnp.zeros_like, model_params)

        ag = {
            "prev_params": tree_copy(model_params),
            "has_prev": jnp.zeros((), jnp.float32),
            "running_fisher": zeros(),
            "tmp_fisher": zeros(),
            "normalized_fisher": zeros(),
            "step_in_task": jnp.zeros((), jnp.int32),
        }
        if self.needs_kd:
            ag.update(teacher_params=tree_copy(model_params),
                      teacher_stats=tree_copy(batch_stats),
                      has_teacher=jnp.zeros((), jnp.float32))
        return ag

    def _build_train_task_fn(self):
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))
        tx = self.tx
        lam, alpha, fua = self.lambda_, self.alpha, self.fua

        def loss_fn(p, stats, xb, yb, ctx, agent_state):
            logits, new_stats = forward_train(self.module, p, stats, xb)
            loss = self.criterion(logits, yb, ctx)
            reg = sum(jnp.sum(f * (a - b) ** 2) for f, a, b in zip(
                jax.tree_util.tree_leaves(agent_state["normalized_fisher"]),
                jax.tree_util.tree_leaves(p),
                jax.tree_util.tree_leaves(agent_state["prev_params"])))
            loss = loss + lam * reg * agent_state["has_prev"]
            loss = self.maybe_kd_blend(loss, logits, xb, ctx, agent_state)
            return loss, (new_stats, logits)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state, ctx, xb, yb):
            ag = dict(state.agent)
            i = ag["step_in_task"]

            # EMA fold-in every fisher_update_after steps (reference :97-106;
            # checked *before* the step with the 1-based counter)
            def fold(ag):
                ag = dict(ag)
                ag["running_fisher"] = jax.tree_util.tree_map(
                    lambda r, t: (1.0 - alpha) * r + (alpha / fua) * t,
                    ag["running_fisher"], ag["tmp_fisher"])
                ag["tmp_fisher"] = jax.tree_util.tree_map(
                    jnp.zeros_like, ag["tmp_fisher"])
                return ag

            ag = jax.lax.cond((i + 1) % fua == 0, fold, lambda a: dict(a), ag)

            (loss, (stats, logits)), grads = grad_fn(
                state.params, state.batch_stats, xb, yb, ctx, ag)
            ag["tmp_fisher"] = jax.tree_util.tree_map(
                lambda t, g: t + g ** 2, ag["tmp_fisher"], grads)
            ag["step_in_task"] = i + 1

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            acc = jnp.mean((jnp.argmax(logits, 1) == yb).astype(jnp.float32))
            new_state = state.replace(params=params, batch_stats=stats,
                                      opt_state=opt_state, agent=ag)
            return new_state, {"loss": loss, "acc": acc}

        def train_task_fn(state, ctx, xs, ys):
            return jax.lax.scan(lambda c, i: step(c, ctx, i[0], i[1]),
                                state, (xs, ys), unroll=unroll)

        return train_task_fn

    def train_task(self, state, ctx, x_train, y_train):
        ag = dict(state.agent)
        ag["step_in_task"] = jnp.zeros((), jnp.int32)
        state = state.replace(agent=ag)
        return super().train_task(state, ctx, x_train, y_train)

    def after_train(self, state, ctx):
        from ocl_tpu.utils.meters import tree_copy

        normalize = self._eval_cache.get("finalize")
        if normalize is None:
            @jax.jit
            def normalize(running):
                leaves = jax.tree_util.tree_leaves(running)
                mx = jnp.max(jnp.stack([jnp.max(l) for l in leaves]))
                mn = jnp.min(jnp.stack([jnp.min(l) for l in leaves]))
                return jax.tree_util.tree_map(
                    lambda f: (f - mn) / (mx - mn + 1e-32), running)

            self._eval_cache["finalize"] = normalize
        ag = dict(state.agent)
        ag["normalized_fisher"] = normalize(ag["running_fisher"])
        # snapshot copied outside jit so XLA cannot alias it to the live params
        ag["prev_params"] = tree_copy(state.params)
        ag["has_prev"] = jnp.ones_like(ag["has_prev"])
        state = state.replace(agent=ag)
        return super().after_train(state, ctx)

    # ----- stacked-state hooks (experiment/parallel_tune.py): the fisher
    # min-max normalization reduces over leaves, which on a stacked [P, ...]
    # state would mix grid points — reduce per point instead.

    def before_task_stacked(self, state):
        ag = dict(state.agent)
        ag["step_in_task"] = jnp.zeros_like(ag["step_in_task"])
        return state.replace(agent=ag)

    def after_train_stacked(self, state, ctx):
        from ocl_tpu.utils.meters import tree_copy

        normalize = self._eval_cache.get("finalize_stacked")
        if normalize is None:
            @jax.jit
            def normalize(running):
                leaves = jax.tree_util.tree_leaves(running)

                def flat(l):
                    return l.reshape(l.shape[0], -1)

                mx = jnp.max(jnp.stack([jnp.max(flat(l), axis=1)
                                        for l in leaves]), axis=0)  # [P]
                mn = jnp.min(jnp.stack([jnp.min(flat(l), axis=1)
                                        for l in leaves]), axis=0)

                def norm(f):
                    b = (-1,) + (1,) * (f.ndim - 1)
                    return (f - mn.reshape(b)) / (
                        mx.reshape(b) - mn.reshape(b) + 1e-32)

                return jax.tree_util.tree_map(norm, running)

            self._eval_cache["finalize_stacked"] = normalize
        ag = dict(state.agent)
        ag["normalized_fisher"] = normalize(ag["running_fisher"])
        ag["prev_params"] = tree_copy(state.params)
        ag["has_prev"] = jnp.ones_like(ag["has_prev"])
        state = state.replace(agent=ag)
        return ContinualLearner.after_train(self, state, ctx)
