"""Slot-sharded memory bank across the device mesh.

SURVEY.md §5.8: the TPU-native way to scale the memory axis is to shard the
buffer's slot dimension over ICI and let XLA's SPMD partitioner turn
retrieval scoring (gumbel top-k, the KNN-SV distance matrix, GSS gradient
cosines) into per-shard compute + collectives. Because every buffer op in
this framework is a pure jnp function over the BufferState pytree, sharding
is *only* a placement annotation — no strategy code changes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def buffer_sharding(mesh: Mesh, axis: str = "data"):
    """NamedSharding pytree for a BufferState: slot axis sharded, scalars
    replicated."""
    slot = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def spec(leaf_path):
        name = leaf_path[-1].name if hasattr(leaf_path[-1], "name") else ""
        return rep if name in ("current_index", "n_seen_so_far",
                               "class_counts") else slot

    return spec


def shard_buffer(buf, mesh: Mesh, axis: str = "data"):
    """Place a BufferState with imgs/labels/score sharded along slots."""
    slot = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return buf.replace(
        imgs=jax.device_put(buf.imgs, slot),
        labels=jax.device_put(buf.labels, slot),
        score=jax.device_put(buf.score, slot),
        current_index=jax.device_put(buf.current_index, rep),
        n_seen_so_far=jax.device_put(buf.n_seen_so_far, rep),
        class_counts=jax.device_put(buf.class_counts, rep),
    )
