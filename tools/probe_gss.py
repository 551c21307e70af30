"""GSS per-sample-gradient lowering probe (VERDICT r2 #3 / weak #2).

Times, on the local device, the components of the GSS update step
(buffer/gss.py) and candidate alternative lowerings of the per-sample
gradient computation, and reports what the vmapped grad's convolutions
lowered to (batch_group_count / feature_group_count) in the jaxpr.

Components (reference utils/buffer/gss_greedy_update.py:22-45,104-122):
  bank   : gss_mem_strength=10 masked 10-row batch grads  (vmap over batches)
  bgrad  : one plain 10-row batch grad
  psample: 10 per-sample grads (vmap over 1-row inputs)   <- suspect
Alternatives for psample:
  loop   : 10 sequential 1-row grads (dispatch-bound strawman)
  masked : vmap over 10 one-hot row masks of the SAME 10-row batch (grads of
           per-row losses; batched-weight convs at 10-row shapes)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def bench(fn, *args, reps=5):
    fn(*args)  # compile+warm
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    return best * 1e3  # ms


def conv_forms(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            p = eqn.params
            out.append((tuple(eqn.invars[0].aval.shape),
                        tuple(eqn.invars[1].aval.shape),
                        p["batch_group_count"], p["feature_group_count"]))
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                conv_forms(sub.jaxpr, out)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        conv_forms(s.jaxpr, out)
    return out


def main():
    from ocl_tpu.config import apply_platform_env, default_params

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from ocl_tpu.models import forward_eval, init_model
    from ocl_tpu.models.resnet import Reduced_ResNet18
    from ocl_tpu.ops.losses import cross_entropy

    module = Reduced_ResNet18(10)
    params, stats = init_model(module, jax.random.PRNGKey(0), "cifar10")
    g = np.random.RandomState(0)
    B, S = 10, 10
    x = jnp.asarray(g.rand(B, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 10, (B,)), jnp.int32)
    xb = jnp.asarray(g.rand(S, B, 32, 32, 3), jnp.float32)
    yb = jnp.asarray(g.randint(0, 10, (S, B)), jnp.int32)

    def ce(p, x, y, w=None):
        return cross_entropy(forward_eval(module, p, stats, x), y, mask=w)

    def flat_grad(p, x, y, w=None):
        return ravel_pytree(jax.grad(ce)(p, x, y, w))[0]

    # per-call dispatch over the axon tunnel costs ~100ms — amortize every
    # variant over a scanned N-step loop inside one jit (like bench.py); a
    # fresh batch per step defeats loop-invariant hoisting
    N = 100
    xs_steps = jnp.asarray(g.rand(N, B, 32, 32, 3), jnp.float32)
    ys_steps = jnp.asarray(g.randint(0, 10, (N, B)), jnp.int32)
    eye = jnp.eye(B)

    def scanned(body):
        def run(p):
            def step(c, inp):
                xi, yi = inp
                return c + body(p, xi, yi), None

            out, _ = jax.lax.scan(step, jnp.zeros(()), (xs_steps, ys_steps))
            return out

        return jax.jit(run)

    x100 = jnp.asarray(g.rand(100, 32, 32, 3), jnp.float32)
    y100 = jnp.asarray(g.randint(0, 10, (100,)), jnp.int32)

    def group_losses(p, xbs, ybs):
        """[10] per-group CE over one 100-row forward."""
        logits = forward_eval(module, p, stats, xbs.reshape(100, 32, 32, 3))
        lse = jax.nn.logsumexp(logits, axis=1)
        ll = logits[jnp.arange(100), ybs.reshape(100)]
        return (lse - ll).reshape(10, 10).mean(axis=1)

    def ravel_jac(jac):
        leaves = jax.tree_util.tree_leaves(jac)
        return jnp.concatenate([l.reshape(10, -1) for l in leaves], axis=1)
    variants = {
        "plain 10-row grad": scanned(
            lambda p, xi, yi: jnp.sum(flat_grad(p, xi, yi))),
        # 10x the rows of the plain grad in ONE well-shaped backward: the
        # compute-scaling control for the latency-bound floor argument
        "plain 100-row grad": scanned(
            lambda p, xi, yi: jnp.sum(flat_grad(
                p, x100 * (1.0 + 1e-6 * jnp.sum(xi)), y100))),
        # tie the bank batches to the step input (cheap elementwise) so XLA
        # cannot hoist the loop-invariant vmap out of the scan
        "bank vmap 10x10-row": scanned(
            lambda p, xi, yi: jnp.sum(jax.vmap(
                lambda xj, yj: flat_grad(p, xj, yj))(
                    xb * (1.0 + 1e-6 * jnp.sum(xi)), yb))),
        "psample vmap 10x1-row": scanned(
            lambda p, xi, yi: jnp.sum(jax.vmap(
                lambda xj, yj: flat_grad(p, xj[None], yj[None]))(xi, yi))),
        "psample masked 10x10-row": scanned(
            lambda p, xi, yi: jnp.sum(jax.vmap(
                lambda w: flat_grad(p, xi, yi, w))(eye))),
        # bank alternative A: 100 per-sample grads in one vmap, then
        # segment-sum into the 10 group grads (per-sample lowering amortizes
        # better than per-group grouped convs?)
        "bank psample100+segsum": scanned(
            lambda p, xi, yi: jnp.sum(jax.vmap(
                lambda xj, yj: flat_grad(p, xj[None], yj[None]))(
                    (xb * (1.0 + 1e-6 * jnp.sum(xi))).reshape(100, 32, 32, 3),
                    yb.reshape(100)).reshape(10, 10, -1).mean(axis=1))),
        # bank alternative B: one shared 100-row forward, jacrev over the
        # 10-dim group-loss vector (vmapped vjp cotangents)
        "bank jacrev group losses": scanned(
            lambda p, xi, yi: jnp.sum(ravel_jac(jax.jacrev(
                lambda q: group_losses(q, xb * (1.0 + 1e-6 * jnp.sum(xi)),
                                       yb))(p)))),
    }
    times = {}
    for name, fn in variants.items():
        times[name] = bench(fn, params) / N
    base = times["plain 10-row grad"]
    for name, t in times.items():
        print(f"{name:28s}: {t:8.3f} ms/step ({t / base:4.1f}x plain)")

    # equivalence of the masked alternative (BN eval mode -> rows independent;
    # masked CE mean over 1 row == that row's loss)
    psample = jax.jit(lambda p: jax.vmap(
        lambda xi, yi: flat_grad(p, xi[None], yi[None]))(x, y))
    masked = jax.jit(lambda p: jax.vmap(lambda w: flat_grad(p, x, y, w))(eye))
    gps = np.asarray(psample(params))
    gmask = np.asarray(masked(params))
    err = np.max(np.abs(gps - gmask)) / max(np.max(np.abs(gps)), 1e-9)
    print(f"masked == psample: rel err {err:.2e}")

    forms = conv_forms(jax.make_jaxpr(lambda p: psample(p))(params).jaxpr, [])
    grouped = [f for f in forms if f[2] > 1 or f[3] > 1]
    print(f"psample jaxpr: {len(forms)} convs, {len(grouped)} grouped/batched")
    for f in grouped[:8]:
        print("   lhs{} rhs{} batch_groups={} feature_groups={}".format(*f))


if __name__ == "__main__":
    main()
