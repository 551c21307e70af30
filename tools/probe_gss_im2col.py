"""GSS gradient-bank lowering: grouped-conv (nn.Conv) vs im2col (PatchConv).

VERDICT r3 #4: the bank — gss_mem_strength shared-weight batch grads via
vmap(grad) — lowers its weight-grads to per-group convolutions that measured
~3.9x over their pure-compute bound (docs/PERFORMANCE.md). layers.PatchConv
rewrites each conv as patches @ W, turning the vmapped weight-grad into one
batched MXU matmul per layer. This probe times both lowerings inside a
scanned loop on the local device (per-call dispatch over the axon tunnel is
~100 ms, so single-call timings are meaningless), checks bank equivalence,
and reports the conv/dot mix each jaxpr lowered to.

Run on the TPU:  python tools/probe_gss_im2col.py [--steps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def bench(fn, *args, reps=5):
    sync(fn(*args))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--strength", type=int, default=10)
    ap.add_argument("--gss_bsz", type=int, default=10)
    ap.add_argument("--nf", type=int, default=20)
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from ocl_tpu.models import forward_eval, init_model
    from ocl_tpu.models.resnet import Reduced_ResNet18
    from ocl_tpu.ops.losses import cross_entropy

    module = Reduced_ResNet18(10, nf=args.nf)
    patch_module = module.clone(conv_impl="patch")
    params, stats = init_model(module, jax.random.PRNGKey(0), "cifar10")

    g = np.random.RandomState(0)
    S, B, N = args.strength, args.gss_bsz, args.steps
    xb = jnp.asarray(g.rand(S, B, 32, 32, 3), jnp.float32)
    yb = jnp.asarray(g.randint(0, 10, (S, B)), jnp.int32)
    xs_steps = jnp.asarray(g.rand(N, B, 32, 32, 3), jnp.float32)
    ys_steps = jnp.asarray(g.randint(0, 10, (N, B)), jnp.int32)

    def make_bank(mod):
        def ce(p, x, y):
            return cross_entropy(forward_eval(mod, p, stats, x), y)

        def flat_grad(p, x, y):
            return ravel_pytree(jax.grad(ce)(p, x, y))[0]

        def bank(p, xbs, ybs):
            return jax.vmap(lambda xj, yj: flat_grad(p, xj, yj))(xbs, ybs)

        return bank

    def scanned(bank):
        def run(p):
            def step(c, inp):
                xi, _yi = inp
                # tie the bank batches to the step input so XLA cannot
                # hoist the loop-invariant vmap out of the scan
                b = bank(p, xb * (1.0 + 1e-6 * jnp.sum(xi)), yb)
                return c + jnp.sum(b), None

            out, _ = jax.lax.scan(step, jnp.zeros(()), (xs_steps, ys_steps))
            return out

        return jax.jit(run)

    lax_bank = make_bank(module)
    patch_bank = make_bank(patch_module)

    # numeric equivalence of the two lowerings
    a = np.asarray(jax.jit(lax_bank)(params, xb, yb))
    b = np.asarray(jax.jit(patch_bank)(params, xb, yb))
    rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9)
    print(f"bank lax vs patch: rel err {rel:.2e}")

    t_lax = bench(scanned(lax_bank), params) / N
    t_patch = bench(scanned(patch_bank), params) / N
    print(f"bank grouped-conv (nn.Conv) : {t_lax:7.3f} ms/step")
    print(f"bank im2col (PatchConv)     : {t_patch:7.3f} ms/step "
          f"({t_lax / max(t_patch, 1e-9):.2f}x)")

    out = {"strength": S, "gss_bsz": B, "nf": args.nf,
           "bank_lax_ms": round(t_lax, 3), "bank_patch_ms": round(t_patch, 3),
           "rel_err": float(rel)}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "gss_im2col.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
