"""GDumb: greedy class-balanced memory + end-of-task retraining from scratch.

Reference agents/gdumb.py: per sample, add to memory if its class is below
the per-class quota, evicting a random item from the largest class when full
(:19-31); at task end re-initialize the model and train `mem_epoch` epochs of
minibatch SGD with gradient-norm clipping over the memory (:52-83). The
greedy update is host-side bookkeeping (no model involved); the retrain is
one jitted scan over all epochs' shuffled minibatches.
"""

from __future__ import annotations

import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.models import forward_train, init_model
from ocl_tpu.optim import setup_opt


class Gdumb(ContinualLearner):
    uses_buffer = False

    def __init__(self, params):
        super().__init__(params)
        self.mem_img = {}
        self.mem_c = {}
        self.retrain_tx = optax.chain(
            optax.clip_by_global_norm(float(params.clip)),
            setup_opt(params.optimizer, params.learning_rate, params.weight_decay))

    def init_state(self, rng):
        self.mem_img, self.mem_c = {}, {}
        return super().init_state(rng)

    def greedy_balancing_update(self, x, y):
        k_c = self.params.mem_size // max(1, len(self.mem_img))
        if y not in self.mem_img or self.mem_c[y] < k_c:
            if sum(self.mem_c.values()) >= self.params.mem_size:
                cls_max = max(self.mem_c.items(), key=lambda kv: kv[1])[0]
                idx = pyrandom.randrange(self.mem_c[cls_max])
                self.mem_img[cls_max].pop(idx)
                self.mem_c[cls_max] -= 1
            if y not in self.mem_img:
                self.mem_img[y] = []
                self.mem_c[y] = 0
            self.mem_img[y].append(np.asarray(x))
            self.mem_c[y] += 1

    def _build_retrain_fn(self):
        tx = self.retrain_tx
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))

        def loss_fn(p, stats, xb, yb, ctx):
            logits, new_stats = forward_train(self.module, p, stats, xb)
            return self.criterion(logits, yb, ctx), new_stats

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def retrain(params, stats, opt_state, ctx, mem_x, mem_y, idx):
            def body(carry, idxb):
                p, st, opt = carry
                (loss, st), grads = grad_fn(p, st, mem_x[idxb], mem_y[idxb], ctx)
                updates, opt = tx.update(grads, opt, p)
                return (optax.apply_updates(p, updates), st, opt), loss

            (params, stats, opt_state), losses = jax.lax.scan(
                body, (params, stats, opt_state), idx, unroll=unroll)
            return params, stats, opt_state, losses

        return retrain

    def _build_stacked_retrain_fn(self):
        """Per-point retrain for the grid-parallel tuner: the balanced memory
        and minibatch order are shared across points (paired comparison);
        each point re-inits its own model from its own rng and retrains with
        its own lr/wd injected into a fresh optimizer state."""
        tx = optax.chain(
            optax.clip_by_global_norm(float(self.params.clip)),
            setup_opt(self.params.optimizer, self.params.learning_rate,
                      self.params.weight_decay, inject=True))
        unroll = max(1, int(getattr(self.params, "scan_unroll", 1)))

        def loss_fn(p, stats, xb, yb, ctx):
            logits, new_stats = forward_train(self.module, p, stats, xb)
            return self.criterion(logits, yb, ctx), new_stats

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def retrain_one(init_rng, lr, wd, ctx, mem_x, mem_y, idx):
            params, stats = init_model(self.module, init_rng, self.data)
            opt_state = tx.init(params)
            # chain state = (clip EmptyState, InjectHyperparamsState)
            opt_state[1].hyperparams["learning_rate"] = lr
            opt_state[1].hyperparams["weight_decay"] = wd

            def body(carry, idxb):
                p, st, opt = carry
                (loss, st), grads = grad_fn(p, st, mem_x[idxb], mem_y[idxb], ctx)
                updates, opt = tx.update(grads, opt, p)
                return (optax.apply_updates(p, updates), st, opt), loss

            (params, stats, _), _ = jax.lax.scan(
                body, (params, stats, opt_state), idx, unroll=unroll)
            return params, stats

        return retrain_one

    stacked_consumes_raw = True

    def stacked_train_task(self, state, ctx, x_train, y_train):
        """Grid-parallel GDumb (experiment/parallel_tune.py): the greedy
        balanced memory does not depend on lr/wd, so it is built ONCE
        host-side and shared across points; minibatch orders come from point
        0's rng chain while every point's rng advances exactly like the
        sequential train_task. Point 0 therefore replays the sequential rng
        schedule, memory, and minibatch order exactly; arithmetic matches up
        to vmapped-conv rounding (vmap lowers stacked convs differently —
        same caveat as experiment/parallel_run.py's fallback note), pinned
        via the rounding-immune lr=0 case in tests/test_parallel_tune.py."""
        # per-point (rng, perm_rng, init_rng) — mirrors train_task's split
        splits = jax.vmap(lambda r: jax.random.split(r, 3))(state.rng)
        order = np.asarray(jax.random.permutation(splits[0, 1],
                                                  x_train.shape[0]))
        for i in order:
            self.greedy_balancing_update(x_train[i], int(y_train[i]))

        mem_x, mem_y = [], []
        for c, imgs in self.mem_img.items():
            mem_x += imgs
            mem_y += [c] * self.mem_c[c]
        mem_x = jnp.asarray(np.stack(mem_x), jnp.float32)
        mem_y = jnp.asarray(np.asarray(mem_y), jnp.int32)

        chain = splits[:, 0]
        bs = self.params.batch
        nb = len(mem_y) // bs
        epochs_idx = []
        if nb > 0:
            for ep in range(self.params.mem_epoch):
                pair = jax.vmap(lambda r: jax.random.split(r))(chain)
                chain, r_ep = pair[:, 0], pair[:, 1]
                perm = np.asarray(jax.random.permutation(r_ep[0], len(mem_y)))
                epochs_idx.append(perm[: nb * bs].reshape(nb, bs))
        idx = jnp.asarray(np.concatenate(epochs_idx)) if epochs_idx \
            else jnp.zeros((0, bs), jnp.int32)

        fn = self._eval_cache.get("stacked_retrain")
        if fn is None:
            fn = jax.jit(jax.vmap(self._build_stacked_retrain_fn(),
                                  in_axes=(0, 0, 0, None, None, None, None)))
            self._eval_cache["stacked_retrain"] = fn
        hp = state.opt_state.hyperparams
        params, stats = fn(splits[:, 2], hp["learning_rate"],
                           hp["weight_decay"], ctx, mem_x, mem_y, idx)
        # keep the injected opt_state: it carries each point's lr/wd for the
        # next task (the retrain optimizer itself is re-created per task)
        return state.replace(params=params, batch_stats=stats, rng=chain)

    def train_task(self, state, ctx, x_train, y_train):
        # stream through memory in shuffled order (reference DataLoader shuffle)
        rng, perm_rng, init_rng = jax.random.split(state.rng, 3)
        order = np.asarray(jax.random.permutation(perm_rng, x_train.shape[0]))
        for i in order:
            self.greedy_balancing_update(x_train[i], int(y_train[i]))

        mem_x, mem_y = [], []
        for c, imgs in self.mem_img.items():
            mem_x += imgs
            mem_y += [c] * self.mem_c[c]
        mem_x = jnp.asarray(np.stack(mem_x), jnp.float32)
        mem_y = jnp.asarray(np.asarray(mem_y), jnp.int32)

        # re-init model + optimizer (reference :61-63)
        params, stats = init_model(self.module, init_rng, self.data)
        opt_state = self.retrain_tx.init(params)

        bs = self.params.batch
        nb = len(mem_y) // bs
        if nb > 0:
            epochs_idx = []
            for ep in range(self.params.mem_epoch):
                rng, r = jax.random.split(rng)
                perm = np.asarray(jax.random.permutation(r, len(mem_y)))
                epochs_idx.append(perm[: nb * bs].reshape(nb, bs))
            idx = jnp.asarray(np.concatenate(epochs_idx))

            fn = self._eval_cache.get("retrain")
            if fn is None:
                fn = jax.jit(self._build_retrain_fn())
                self._eval_cache["retrain"] = fn
            params, stats, opt_state, _ = fn(params, stats, opt_state, ctx,
                                             mem_x, mem_y, idx)
        return state.replace(params=params, batch_stats=stats,
                             opt_state=opt_state, rng=rng)
