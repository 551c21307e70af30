"""Probe: does bf16 conv compute lift the bare fwd/bwd floor on this chip?

Times the bare combined-batch (bs=20) fwd/bwd+SGD scan in f32 vs bf16 params
+ inputs (f32 loss/reductions). Decides whether a mixed-precision mode is
worth wiring into the framework.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ocl_tpu.config import apply_platform_env, default_params

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ocl_tpu.models import forward_train
    from ocl_tpu.registry import agents

    n_steps, bs = 200, 20
    p = default_params(data="synthetic", agent="ER", mem_size=1000, batch=10,
                       eps_mem_batch=10, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    module, tx = agent.module, agent.tx

    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(n_steps, bs, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 10, (n_steps, bs)), jnp.int32)

    def run_variant(tag, dtype):
        def loss_fn(params, stats, xb, yb):
            cast = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
            logits, new_stats = forward_train(module, cast, stats,
                                              xb.astype(dtype))
            logits = logits.astype(jnp.float32)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, yb))
            return loss, new_stats

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def scan_fn(state, xs, ys):
            params, stats, opt_state = (state.params, state.batch_stats,
                                        state.opt_state)

            def body(carry, inp):
                params, stats, opt_state = carry
                (loss, stats), grads = grad_fn(params, stats, inp[0], inp[1])
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, stats, opt_state), loss

            _, losses = jax.lax.scan(body, (params, stats, opt_state), (xs, ys))
            return losses

        fn = jax.jit(scan_fn)
        out = fn(state, xs, ys)
        np.asarray(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            out = fn(state, xs, ys)
            np.asarray(out)
            best = min(best, time.time() - t0)
        print("%-12s %.3f ms/step  (%.0f img/s incl. mem)" %
              (tag, best / n_steps * 1e3, bs * n_steps / best))

    run_variant("f32", jnp.float32)
    run_variant("bf16", jnp.bfloat16)


if __name__ == "__main__":
    main()
