"""iCaRL (online variant).

Reference agents/icarl.py: BCE-with-logits over one-hot targets in a
*compact* label space (labels remapped to insertion order, :43-46); once a
previous-task snapshot exists, a memory batch is appended with all-zero
targets and every old-class column's target is replaced by the snapshot's
sigmoid outputs (:57-62). The buffer updates inside the train loop and
already-updated slots are excluded from retrieval within the task (:65) — the
host-side index list becomes an `updated_mask` carried through the scan.
Classification at eval is nearest-class-mean (base class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.buffer import build_update
from ocl_tpu.buffer.retrieve import random_retrieve
from ocl_tpu.models import forward_teacher, forward_train
from ocl_tpu.ops.losses import bce_ohe


class Icarl(ContinualLearner):
    def __init__(self, params):
        super().__init__(params)
        self.update_fn = build_update(self)
        self.compact = {}  # original label -> compact column id (per run)

    def init_state(self, rng):
        self.compact = {}
        return super().init_state(rng)

    def init_agent_state(self, model_params, batch_stats):
        from ocl_tpu.utils.meters import tree_copy

        return {"teacher_params": tree_copy(model_params),
                "teacher_stats": tree_copy(batch_stats),
                "has_teacher": jnp.zeros((), jnp.float32)}

    def _build_train_task_fn(self):
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))
        tx = self.tx
        update_fn = self.update_fn
        n_classes = self.n_classes
        # parity-ablation hooks (tools/parity_vs_reference.py ICARL_* rows):
        # not part of the public flag surface, set via params attributes only
        abl_noexcl = bool(getattr(self.params, "abl_icarl_noexcl", False))
        abl_evalbn = bool(getattr(self.params, "abl_icarl_teacher_evalbn", False))

        def loss_fn(p, stats, x_all, targets, row_mask, col_mask):
            logits, new_stats = forward_train(self.module, p, stats, x_all, w=row_mask)
            return bce_ohe(logits, targets, class_mask=col_mask, mask=row_mask), new_stats

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, ctx_label_map, n_old, all_cls, xb, yb):
            state, updated_mask = carry
            params, stats, buf = state.params, state.batch_stats, state.buffer
            rng, r_ret, r_upd = jax.random.split(state.rng, 3)
            batch = xb.shape[0]
            cols = jnp.arange(n_classes)
            col_mask = cols < all_cls
            old_cols = cols < n_old

            map_y = ctx_label_map[yb]
            tgt_batch = jax.nn.one_hot(map_y, n_classes, dtype=jnp.float32)

            mem_x, _, mem_idx, mem_mask = random_retrieve(
                buf, batch, r_ret,
                excl_mask=None if abl_noexcl else updated_mask)
            has_prev = state.agent["has_teacher"] > 0
            mem_mask = mem_mask & has_prev

            x_all = jnp.concatenate([xb, mem_x])
            targets = jnp.concatenate([tgt_batch, jnp.zeros_like(tgt_batch)])
            row_mask = jnp.concatenate([jnp.ones(batch, bool), mem_mask])

            def distill(t):
                if abl_evalbn:  # ablation: running-stat BN instead
                    from ocl_tpu.models import forward_eval

                    q = jax.nn.sigmoid(forward_eval(
                        self.module, state.agent["teacher_params"],
                        state.agent["teacher_stats"], x_all))
                else:
                    # prev_model deepcopied in train mode (reference
                    # icarl.py:31) -> batch-stat BN over the valid rows of
                    # the combined batch
                    q = jax.nn.sigmoid(forward_teacher(
                        self.module, state.agent["teacher_params"],
                        state.agent["teacher_stats"], x_all, w=row_mask))
                return jnp.where(old_cols[None, :], q, t)

            targets = jax.lax.cond(has_prev, distill, lambda t: t, targets)

            (loss, stats), grads = grad_fn(params, stats, x_all, targets,
                                           row_mask, col_mask)
            updates, opt_state = tx.update(grads, state.opt_state, params)
            params = optax.apply_updates(params, updates)

            buf, replaced = update_fn(params, stats, buf, xb, yb, r_upd)
            mem = buf.labels.shape[0]
            updated_mask = updated_mask.at[
                jnp.where(replaced >= 0, replaced, mem)].set(True, mode="drop")

            new_state = state.replace(params=params, batch_stats=stats,
                                      opt_state=opt_state, buffer=buf, rng=rng)
            return (new_state, updated_mask), {"loss": loss}

        def train_task_fn(state, label_map, n_old, all_cls, xs, ys):
            mem = state.buffer.labels.shape[0]
            updated0 = jnp.zeros(mem, bool)

            def body(carry, inp):
                return step(carry, label_map, n_old, all_cls, inp[0], inp[1])

            (state, _), metrics = jax.lax.scan(body, (state, updated0),
                                               (xs, ys), unroll=unroll)
            return state, metrics

        return train_task_fn

    def train_task(self, state, ctx, x_train, y_train):
        # compact-id assignment in insertion order (reference :43-46)
        for lbl in self.new_labels:
            if lbl not in self.compact:
                self.compact[lbl] = len(self.compact)
        label_map = np.zeros(self.n_classes, np.int32)
        for orig, cid in self.compact.items():
            label_map[orig] = cid
        n_old = len(self.old_labels)
        all_cls = len(self.old_labels) + len(self.new_labels)

        state, xs, ys = self.batchify(state, x_train, y_train)
        fn = self._eval_cache.get("train")
        if fn is None:
            fn = jax.jit(self._build_train_task_fn(), donate_argnums=0)
            self._eval_cache["train"] = fn
        state, _ = fn(state, jnp.asarray(label_map),
                      jnp.asarray(n_old, jnp.int32), jnp.asarray(all_cls, jnp.int32),
                      xs, ys)
        return state

    def stacked_train_task(self, state, ctx, xs, ys):
        """Grid-parallel path (experiment/parallel_tune.py): the compact-label
        bookkeeping is host-side and shared across grid points (the tuner
        drives before_train/after_train on this instance); the task fn vmaps
        over the stacked state with the label args broadcast."""
        for lbl in self.new_labels:
            if lbl not in self.compact:
                self.compact[lbl] = len(self.compact)
        label_map = np.zeros(self.n_classes, np.int32)
        for orig, cid in self.compact.items():
            label_map[orig] = cid
        n_old = len(self.old_labels)
        all_cls = len(self.old_labels) + len(self.new_labels)
        fn = self._eval_cache.get("stacked_train")
        if fn is None:
            fn = jax.jit(jax.vmap(self._build_train_task_fn(),
                                  in_axes=(0, None, None, None, None, None)),
                         donate_argnums=0)
            self._eval_cache["stacked_train"] = fn
        state, _ = fn(state, jnp.asarray(label_map),
                      jnp.asarray(n_old, jnp.int32),
                      jnp.asarray(all_cls, jnp.int32), xs, ys)
        return state

    def after_train(self, state, ctx):
        from ocl_tpu.utils.meters import tree_copy

        ag = dict(state.agent)
        # ones_like keeps the flag's [P] shape under stacked states
        # (experiment/parallel_tune.py runs after_train on a [P, ...] state)
        ag.update(teacher_params=tree_copy(state.params),
                  teacher_stats=tree_copy(state.batch_stats),
                  has_teacher=jnp.ones_like(ag["has_teacher"]))
        state = state.replace(agent=ag)
        return super().after_train(state, ctx)
