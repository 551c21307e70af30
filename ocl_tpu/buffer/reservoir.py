"""Reservoir-sampling buffer update as one vectorized scatter.

Reference semantics (utils/buffer/reservoir_update.py:8-60): fill empty slots
sequentially; for overflow items draw uniform indices in [0, n_seen_so_far)
(after the fill), keep those < mem_size, and overwrite with later batch items
winning slot collisions (the reference's dict idx_map). Returns the written
slot per item (-1 where the item was dropped) for iCaRL's exclusion logic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.buffer.state import BufferState, write_slots


def reservoir_update(buf: BufferState, x, y, rng):
    batch = x.shape[0]
    mem = buf.labels.shape[0]
    cur, seen = buf.current_index, buf.n_seen_so_far

    place_left = jnp.maximum(0, mem - cur)
    offset = jnp.minimum(place_left, batch)

    idx = jnp.arange(batch)
    is_seq = idx < offset
    seq_slots = cur + idx

    seen_after_fill = seen + offset
    u = jax.random.uniform(rng, (batch,)) * seen_after_fill.astype(jnp.float32)
    rand_slots = u.astype(jnp.int32)

    slots = jnp.where(is_seq, seq_slots, rand_slots)
    valid = is_seq | (rand_slots < mem)

    # later batch items win slot collisions (reference idx_map dict semantics)
    same = slots[None, :] == slots[:, None]
    later_wins = jnp.any(same & (idx[None, :] > idx[:, None]) & valid[None, :], axis=1)
    write = valid & ~later_wins

    buf = write_slots(buf, slots, x, y, write)
    buf = buf.replace(current_index=cur + offset, n_seen_so_far=seen + batch)
    replaced = jnp.where(write, slots, -1)
    return buf, replaced
