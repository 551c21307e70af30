"""Supervised Contrastive Replay.

Reference agents/scr.py: per batch, retrieve memory, concatenate with the
incoming batch, produce two views (identity + augmentation stack), train with
SupConLoss; classification at eval is nearest-class-mean over buffer exemplar
features (handled by the base class). The kornia GPU pipeline becomes jnp ops
fused into the same jitted scan as the model step (ops/augment.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.buffer import build_retrieve, build_update
from ocl_tpu.models import forward_train
from ocl_tpu.ops.augment import scr_transform
from ocl_tpu.ops.losses import supcon_loss


class SupContrastReplay(ContinualLearner):
    def __init__(self, params):
        super().__init__(params)
        self.retrieve_fn = build_retrieve(self)
        self.update_fn = build_update(self)
        self.temp = float(params.temp)
        # --fused_replay also governs SCR's two views: one forward over
        # [identity; augmented] (2N rows, one combined BN statistic fold)
        # instead of the reference's two sequential N-row passes
        # (reference agents/scr.py:56-58) — same loss, ~1.5x step speed.
        self.fused_views = bool(getattr(params, "fused_replay", False))

    def _two_view_loss(self, p, stats, xb, yb, mask, rng):
        if self.fused_views:
            both = jnp.concatenate([xb, scr_transform(rng, xb)])
            m2 = None if mask is None else jnp.concatenate([mask, mask])
            f, stats = forward_train(self.module, p, stats, both, w=m2)
            f1, f2 = jnp.split(f, 2)
        else:
            f1, stats = forward_train(self.module, p, stats, xb, w=mask)
            f2, stats = forward_train(self.module, p, stats,
                                      scr_transform(rng, xb), w=mask)
        feats = jnp.stack([f1, f2], axis=1)
        return supcon_loss(feats, yb, self.temp, mask=mask), stats

    def _build_train_task_fn(self):
        tx = self.tx
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))
        mem_iters = int(self.params.mem_iters)
        retrieve_fn, update_fn = self.retrieve_fn, self.update_fn

        def loss_fn(p, stats, xb, yb, mask, rng):
            return self._two_view_loss(p, stats, xb, yb, mask, rng)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(state, ctx, xb, yb):
            params, stats = state.params, state.batch_stats
            opt_state, buf = state.opt_state, state.buffer
            rng = state.rng
            loss_out = jnp.zeros(())

            for _ in range(mem_iters):
                rng, r_ret, r_aug = jax.random.split(rng, 3)
                # SCR retrieves before any backward pass (reference
                # agents/scr.py:49), so gradient-based strategies see zeros
                grads_stub = (jax.tree_util.tree_map(jnp.zeros_like, params)
                              if self.params.retrieve == "MIR" else None)
                mem_x, mem_y, mem_mask, stats = retrieve_fn(
                    params, stats, buf, xb, yb, grads_stub, r_ret)
                comb_x = jnp.concatenate([mem_x, xb])
                comb_y = jnp.concatenate([mem_y, yb])
                comb_mask = jnp.concatenate([mem_mask, jnp.ones(yb.shape, bool)])

                def with_mem(operand):
                    p, st, opt = operand
                    (loss, st2), grads = grad_fn(p, st, comb_x, comb_y, comb_mask, r_aug)
                    updates, opt2 = tx.update(grads, opt, p)
                    return optax.apply_updates(p, updates), st2, opt2, loss

                def no_mem(operand):
                    p, st, opt = operand
                    return p, st, opt, jnp.zeros(())

                # reference skips the step entirely when memory is empty
                # (agents/scr.py:49-62)
                params, stats, opt_state, loss_out = jax.lax.cond(
                    jnp.any(mem_mask), with_mem, no_mem, (params, stats, opt_state))

            rng, r_upd = jax.random.split(rng)
            buf, _ = update_fn(params, stats, buf, xb, yb, r_upd)
            new_state = state.replace(params=params, batch_stats=stats,
                                      opt_state=opt_state, buffer=buf, rng=rng)
            return new_state, {"loss": loss_out, "acc": jnp.zeros(())}

        def train_task_fn(state, ctx, xs, ys):
            def body(carry, inp):
                return step(carry, ctx, inp[0], inp[1])

            return jax.lax.scan(body, state, (xs, ys), unroll=unroll)

        return train_task_fn


    def review_loss(self, params, stats, xb, yb, ctx, rng):
        """review_trick for SCR uses the two-view SupCon objective
        (reference agents/base.py:78-80).

        The reference's review step ALSO runs a dead forward first —
        `logits = self.model.forward(batch_x)` (agents/base.py:77) whose
        result the SCR branch immediately overwrites — which still folds
        the identity batch's moments into the BN running stats one extra
        time, so the reference's per-review-batch BN update order is
        [id, id, aug] where ocl's two-view loss alone gives [id, aug].
        Train-mode forwards never read running stats, so the dead
        forward's ONLY effect is that extra fold; pre-folding stats here
        (under stop_gradient, outside the loss) reproduces it exactly.
        Gated by --scr_review_dead_forward (measured by
        tools/probe_scr_hue_law.py --dead_forward).
        """
        # fallback True matches the config default (reference semantics);
        # params namespaces built without the key must not silently drop
        # the reference's extra BN fold (ADVICE r4)
        if getattr(self.params, "scr_review_dead_forward", True):
            _, stats = forward_train(self.module, params, stats, xb)
            stats = jax.lax.stop_gradient(stats)

        def loss_fn(p, st):
            return self._two_view_loss(p, st, xb, yb, None, rng)

        (loss, new_st), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
        return loss, grads, new_st
