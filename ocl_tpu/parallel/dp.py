"""Data-parallel training/eval steps via jit + sharding annotations.

XLA's SPMD partitioner inserts the collectives (psum over gradients, gather
for metrics) from the sharding annotations alone — the TPU-native counterpart
of DistributedDataParallel, which the reference does not have (SURVEY.md
§5.8). Used for: the multi-chip dryrun, sharded evaluation fan-out, and
GDumb/offline retraining where batches are not latency-bound by the online
stream.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ocl_tpu.parallel.mesh import replicated


def make_dp_train_task(agent, mesh):
    """agent's scanned train_task with batches sharded over the mesh.

    The TrainState (params, opt state, buffer) is replicated; each step's
    incoming batch and the retrieved memory slices shard along the batch
    axis. Gradients reduce over ICI automatically.
    """
    fn = agent._build_train_task_fn()
    # xs: [n_batches, B, ...] — shard the per-step batch axis (axis 1).
    # State/ctx shardings are left unspecified so caller placement wins
    # (e.g. a slot-sharded buffer next to replicated params).
    xs_shard = NamedSharding(mesh, P(None, "data"))
    if agent.params.agent == "CNDPM":
        # CN-DPM's task fn takes no TaskCtx (agents/cndpm.py:302) — its
        # label bookkeeping lives in the expert assignments
        in_shardings = (None, xs_shard, xs_shard)
    else:
        in_shardings = (None, None, xs_shard, xs_shard)
    return jax.jit(
        fn,
        in_shardings=in_shardings,
        out_shardings=None,
    )


def make_dp_eval(agent, mesh):
    """Evaluation forward with test batches sharded across the mesh."""
    from ocl_tpu.models import forward_eval

    import jax.numpy as jnp

    def eval_batches(params, stats, x, y, m):
        def body(carry, inp):
            xb, yb, mb = inp
            logits = forward_eval(agent.module, params, stats, xb)
            pred = jnp.argmax(logits, axis=1)
            return carry + jnp.sum((pred == yb) & mb), None

        correct, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), (x, y, m))
        return correct

    return jax.jit(
        eval_batches,
        in_shardings=(replicated(mesh), replicated(mesh),
                      NamedSharding(mesh, P(None, "data")),
                      NamedSharding(mesh, P(None, "data")),
                      NamedSharding(mesh, P(None, "data"))),
        out_shardings=replicated(mesh),
    )
