"""CN-DPM agent: routing, wake updates, and conditional sleep in one scan.

Reference agents/cndpm.py + models/ndpm/ndpm.py:44-187. Per batch: route each
sample by min negative-log-joint (expert 0 = short-term memory), weight expert
NLLs by the routing posterior, update only the used experts (grad clipped by
value 0.5); when the STM fills, "sleep": the next free expert slot trains its
VAE for 4000 steps and its classifier for 1000 steps on STM samples (batch 50,
with replacement), the CRP prior records the STM size, and the STM clears.

The sleep runs as a `lax.cond` branch *inside* the scanned step, so an entire
task — including any number of sleeps — is one XLA program. Per-slot
optimizers are a masked manual SGD/Adam over the stacked parameter leaves
(fresh state per slot, matching per-expert optimizers). The per-expert
MultiStepLR schedule is per-slot step counters (`sched_t`) mapped through
`multistep_lr`: sleep trains the newborn at the base lr, the two scheduler
steps at sleep end (reference ndpm.py:184-185) push it past milestone 1, and
each wake update steps the counter again (ndpm.py:94-95).

Capacity note: when all `max_experts` slots are born, further sleeps clear
the STM without training (the reference grows unboundedly; static shapes
require a cap — raise --max_experts if the saturation counter is nonzero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.agents.base import ContinualLearner
from ocl_tpu.config import input_size_match, n_classes_match
from ocl_tpu.models import ndpm_vars as V
from ocl_tpu.models.ndpm import collect_nll, init_ndpm_params, ndpm_predict
from ocl_tpu.agents.base import TrainState


def _zeros_like_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _clip_value(tree, v):
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -v, v), tree)


def _masked_slot_update(opt_name, lr, grads, opt, params, slot_mask):
    """Manual per-slot SGD/Adam over stacked [K, ...] leaves.

    `lr` is a scalar or a per-slot [K] vector (the per-expert MultiStepLR
    schedule, reference models/ndpm/component.py:53-55).
    """
    lr = jnp.asarray(lr)

    def blr(a):
        if lr.ndim == 0:
            return lr
        return lr.reshape((-1,) + (1,) * (a.ndim - 1))

    def bmask(a):
        return slot_mask.reshape((-1,) + (1,) * (a.ndim - 1)).astype(a.dtype)

    grads = _clip_value(grads, V.CLIP_VALUE)
    if opt_name == "Adam":
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = opt["t"] + slot_mask.astype(jnp.int32)
        tf = jnp.maximum(t, 1).astype(jnp.float32)
        new_m = jax.tree_util.tree_map(
            lambda m, g: m + bmask(g) * ((1 - b1) * g + (b1 - 1) * m),
            opt["m"], grads)
        new_v = jax.tree_util.tree_map(
            lambda v, g: v + bmask(g) * ((1 - b2) * g * g + (b2 - 1) * v),
            opt["v"], grads)

        def upd(p, m, v):
            bc1 = 1 - b1 ** tf
            bc2 = 1 - b2 ** tf
            bc1 = bc1.reshape((-1,) + (1,) * (p.ndim - 1))
            bc2 = bc2.reshape((-1,) + (1,) * (p.ndim - 1))
            step = blr(p) * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return p - bmask(p) * step

        new_params = jax.tree_util.tree_map(upd, params, new_m, new_v)
        return new_params, {"m": new_m, "v": new_v, "t": t}
    # SGD
    new_params = jax.tree_util.tree_map(
        lambda p, g: p - bmask(p) * blr(p) * g, params, grads)
    return new_params, opt


def multistep_lr(base_lr, sched_t, milestones=V.LR_MILESTONES,
                 gamma=V.LR_GAMMA):
    """Per-slot torch MultiStepLR: lr * gamma^(#milestones passed).

    sched_t [K] counts scheduler.step() calls per expert (reference
    component.py:53-55 builds one MultiStepLR per component; ndpm.py:95 steps
    it after every wake update and ndpm.py:184-185 twice at sleep end).
    """
    passed = jnp.zeros_like(sched_t)
    for m in milestones:
        passed = passed + (sched_t >= m).astype(jnp.int32)
    return base_lr * gamma ** passed.astype(jnp.float32)


class Cndpm(ContinualLearner):
    uses_buffer = False

    def __init__(self, params):
        super().__init__(params)
        self.K = int(params.max_experts)
        self.stm_capacity = int(params.stm_capacity)
        self.n_cls = n_classes_match[params.data]

    def init_state(self, rng):
        rng, r_init = jax.random.split(rng)
        model_params = init_ndpm_params(r_init, self.params)
        self.old_labels, self.new_labels, self.task_seen = [], [], 0
        K, B = self.K, self.params.batch
        shape = tuple(input_size_match[self.data])

        def opt_for(tree):
            if self.params.optimizer == "Adam":
                return {"m": _zeros_like_tree(tree), "v": _zeros_like_tree(tree),
                        "t": jnp.zeros((K,), jnp.int32)}
            return {}

        agent = {
            # CRP prior log-counts: [1+K]; slot 0 (STM) starts at log_alpha,
            # unborn experts at -inf (reference priors.py:24-63)
            "log_counts": jnp.full((1 + K,), -jnp.inf).at[0].set(
                float(self.params.log_alpha)),
            "active": jnp.zeros((), jnp.int32),
            "stm_x": jnp.zeros((self.stm_capacity + B,) + shape, jnp.float32),
            "stm_y": jnp.zeros((self.stm_capacity + B,), jnp.int32),
            "stm_count": jnp.zeros((), jnp.int32),
            "saturated_sleeps": jnp.zeros((), jnp.int32),
            # per-expert MultiStepLR step counters (g and d schedulers are
            # always stepped together, reference expert.py:54-58)
            "sched_t": jnp.zeros((K,), jnp.int32),
        }
        opt_state = {"g": opt_for(model_params["vae"]),
                     "d": opt_for(model_params["cls"])}
        return TrainState(params=model_params, batch_stats={},
                          opt_state=opt_state, buffer=None, agent=agent, rng=rng)

    # ------------------------------------------------------------ training

    def _build_train_task_fn(self):
        params_ns = self.params
        # scan_unroll is ignored here: the step body embeds the full sleep
        # training loop (lax.cond), so unrolling multiplies an already-huge
        # program for a step that is routing-bound, not loop-overhead-bound
        unroll = 1
        K = self.K
        cap = self.stm_capacity
        sleep_g = int(getattr(params_ns, "sleep_step_g", V.SLEEP_STEP_G))
        sleep_d = int(getattr(params_ns, "sleep_step_d", V.SLEEP_STEP_D))
        lr = float(params_ns.learning_rate)
        opt_name = params_ns.optimizer

        def wake_loss(model_params, xb, yb, log_counts, rng):
            nll = collect_nll(model_params, xb, yb, rng, params_ns)  # [B, 1+K]
            nl_joint = jax.lax.stop_gradient(nll) - log_counts[None, :]
            dest = jnp.argmin(nl_joint, axis=1)
            to_stm = dest == 0
            min_joint = jnp.min(nl_joint, axis=1, keepdims=True)
            to_expert = jnp.exp(-nl_joint + min_joint)
            to_expert = to_expert.at[:, 0].set(0.0)
            to_expert = to_expert / (jnp.sum(to_expert, axis=1, keepdims=True) + 1e-7)
            nll_train = nll * (1.0 - to_stm.astype(jnp.float32))[:, None]
            losses = jnp.sum(nll_train * to_expert, axis=0)  # [1+K]
            usage = jnp.sum(to_expert, axis=0)
            return jnp.sum(losses), (to_stm, usage)

        wake_grad = jax.value_and_grad(wake_loss, has_aux=True)

        def sleep(carry):
            model_params, opt_state, ag, rng = carry
            k = ag["active"]  # next free slot (0-based over real experts)

            def do_sleep(operand):
                model_params, opt_state, ag, rng = operand
                n = ag["stm_count"]
                # prior for the new expert: logaddexp(0, log n)
                # (add_expert + record_usage(len(dream)), reference :108-125)
                lc = ag["log_counts"].at[1 + k].set(
                    jnp.logaddexp(0.0, jnp.log(n.astype(jnp.float32))))

                def g_loss(mp, xb, yb, rng):
                    from ocl_tpu.models.ndpm import vae_collect_nll

                    nll = vae_collect_nll(mp, xb, rng, K)[:, 1 + k]
                    wd = sum(jnp.sum(a[k] ** 2) for a in
                             jax.tree_util.tree_leaves(mp["vae"]))
                    return jnp.mean(nll) + V.WEIGHT_DECAY * wd

                def d_loss(mp, xb, yb, rng):
                    from ocl_tpu.models.ndpm import cls_collect_nll

                    nll = cls_collect_nll(mp, xb, yb, K, self.n_cls,
                                          params_ns.classifier_chill)[:, 1 + k]
                    wd = sum(jnp.sum(a[k] ** 2) for a in
                             jax.tree_util.tree_leaves(mp["cls"]))
                    return jnp.mean(nll) + V.WEIGHT_DECAY * wd

                slot_mask = jax.nn.one_hot(k, K, dtype=jnp.float32) > 0

                # the newborn's scheduler has never stepped (sched_t=0) —
                # sleep trains at the full base lr (decay lands only after
                # the two post-sleep scheduler steps, reference :184-185)
                sleep_lr = multistep_lr(lr, ag["sched_t"])

                def train_comp(loss_fn, part, opt_key, steps, carry):
                    mp, opt_state, rng = carry

                    def body(i, st):
                        mp, opt, rng = st
                        rng, r_b, r_z = jax.random.split(rng, 3)
                        idx = jax.random.randint(r_b, (V.SLEEP_BATCH_SIZE,), 0, n)
                        xb = ag["stm_x"][idx]
                        yb = ag["stm_y"][idx]
                        grads = jax.grad(loss_fn)(mp, xb, yb, r_z)
                        new_part, new_opt = _masked_slot_update(
                            opt_name, sleep_lr, grads[part], opt, mp[part],
                            slot_mask)
                        mp = dict(mp)
                        mp[part] = new_part
                        return mp, new_opt, rng

                    mp, new_opt, rng = jax.lax.fori_loop(
                        0, steps, body, (mp, opt_state[opt_key], rng))
                    opt_state = dict(opt_state)
                    opt_state[opt_key] = new_opt
                    return mp, opt_state, rng

                mp, opt_state2, rng = train_comp(g_loss, "vae", "g",
                                                 sleep_g,
                                                 (dict(model_params), opt_state, rng))
                mp, opt_state2, rng = train_comp(d_loss, "cls", "d",
                                                 sleep_d,
                                                 (mp, opt_state2, rng))
                ag2 = dict(ag)
                ag2["log_counts"] = lc
                ag2["active"] = ag["active"] + 1
                ag2["stm_count"] = jnp.zeros((), jnp.int32)
                # expert.lr_scheduler_step() called twice at sleep end
                # (reference ndpm.py:184-185) -> newborn crosses milestone 1
                ag2["sched_t"] = ag["sched_t"].at[k].add(2)
                return mp, opt_state2, ag2, rng

            def saturated(operand):
                model_params, opt_state, ag, rng = operand
                ag2 = dict(ag)
                ag2["stm_count"] = jnp.zeros((), jnp.int32)
                ag2["saturated_sleeps"] = ag["saturated_sleeps"] + 1
                return model_params, opt_state, ag2, rng

            return jax.lax.cond(k < K, do_sleep, saturated,
                                (model_params, opt_state, ag, rng))

        def step(state, xb, yb):
            ag = dict(state.agent)
            rng, r_nll = jax.random.split(state.rng)
            (loss, (to_stm, usage)), grads = wake_grad(
                state.params, xb, yb, ag["log_counts"], r_nll)

            # push routed samples into the STM (reference ndpm.py:58-62)
            pos = ag["stm_count"] + jnp.cumsum(to_stm.astype(jnp.int32)) - 1
            cap_total = ag["stm_x"].shape[0]
            slot = jnp.where(to_stm, pos, cap_total)
            ag["stm_x"] = ag["stm_x"].at[slot].set(xb, mode="drop")
            ag["stm_y"] = ag["stm_y"].at[slot].set(yb, mode="drop")
            ag["stm_count"] = ag["stm_count"] + jnp.sum(to_stm.astype(jnp.int32))

            # CRP usage recording (reference priors.py:40-52)
            ag["log_counts"] = jnp.logaddexp(
                ag["log_counts"], jnp.log(jnp.maximum(usage, 1e-30)) +
                jnp.where(usage > 0, 0.0, -jnp.inf))

            # wake update of used experts at each expert's scheduled lr
            # (post-sleep experts sit past milestone 1 -> 0.2x base)
            slot_mask = usage[1:] > 0
            wake_lr = multistep_lr(lr, ag["sched_t"])
            model_params = dict(state.params)
            opt_state = dict(state.opt_state)
            model_params["vae"], opt_state["g"] = _masked_slot_update(
                opt_name, wake_lr, grads["vae"], opt_state["g"],
                model_params["vae"], slot_mask)
            model_params["cls"], opt_state["d"] = _masked_slot_update(
                opt_name, wake_lr, grads["cls"], opt_state["d"],
                model_params["cls"], slot_mask)
            # every wake optimizer step also steps the scheduler
            # (reference ndpm.py:94-95)
            ag["sched_t"] = ag["sched_t"] + slot_mask.astype(jnp.int32)

            model_params, opt_state, ag, rng = jax.lax.cond(
                ag["stm_count"] >= cap, sleep,
                lambda c: c, (model_params, opt_state, ag, rng))

            new_state = state.replace(params=model_params, opt_state=opt_state,
                                      agent=ag, rng=rng)
            return new_state, {"loss": loss,
                               "stm": ag["stm_count"].astype(jnp.float32)}

        def train_task_fn(state, xs, ys):
            return jax.lax.scan(lambda c, i: step(c, i[0], i[1]),
                                state, (xs, ys), unroll=unroll)

        return train_task_fn

    def train_task(self, state, ctx, x_train, y_train):
        state, xs, ys = self.batchify(state, x_train, y_train)
        fn = self._eval_cache.get("train")
        if fn is None:
            fn = jax.jit(self._build_train_task_fn(), donate_argnums=0)
            self._eval_cache["train"] = fn
        state, metrics = fn(state, xs, ys)
        if getattr(self.params, "debug_nans", False) and "loss" in metrics:
            import numpy as np

            loss = np.asarray(metrics["loss"])
            if not np.all(np.isfinite(loss)):
                bad = int(np.nonzero(~np.isfinite(loss))[0][0])
                raise FloatingPointError(
                    "non-finite CN-DPM loss at step {} of task {} "
                    "(--debug_nans)".format(bad, self.task_seen))
        n_sat = int(state.agent["saturated_sleeps"])
        if n_sat > 0:
            import warnings

            warnings.warn(
                "CN-DPM: {} sleep(s) hit the --max_experts={} cap and "
                "discarded their STM contents; results will diverge from the "
                "unbounded reference — raise --max_experts.".format(
                    n_sat, self.K), RuntimeWarning, stacklevel=2)
        if self.verbose:
            print("[CNDPM] experts: {} stm: {} saturated_sleeps: {}".format(
                int(state.agent["active"]), int(state.agent["stm_count"]),
                n_sat))
        return state

    # ------------------------------------------------------------- evaluate

    def evaluate(self, state, test_loaders):
        import numpy as np

        params_ns = self.params
        fn = self._eval_cache.get("eval")
        if fn is None:
            @jax.jit
            def fn(model_params, log_counts, active, rng, x, y, m):
                def body(carry, inp):
                    xb, yb, mb = inp
                    log_joint = ndpm_predict(model_params, xb, rng, log_counts,
                                             active, params_ns)
                    pred = jnp.argmax(log_joint, axis=1)
                    return carry + jnp.sum((pred == yb) & mb), None

                correct, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                          (x, y, m))
                return correct

            self._eval_cache["eval"] = fn
        accs = np.zeros(len(test_loaders))
        ag = state.agent
        rng = jax.random.fold_in(state.rng, 99)
        if int(ag["active"]) == 0:
            # no expert to run on the input (reference ndpm.py:27-28) —
            # report chance-level instead of raising
            return accs
        for t, (x, y, m) in enumerate(test_loaders):
            correct = fn(state.params, ag["log_counts"], ag["active"], rng, x, y, m)
            accs[t] = float(correct) / max(int(np.sum(np.asarray(m))), 1)
        if self.verbose:
            print(accs)
        return accs
