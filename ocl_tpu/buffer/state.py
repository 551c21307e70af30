"""Fixed-shape episodic memory state.

The reference mutates preallocated tensors behind an OO facade (reference:
utils/buffer/buffer.py:8-40). Here the buffer is an immutable pytree that
update/retrieve strategies transform as pure functions inside the jitted train
step: masking over `current_index` replaces dynamic shapes, and per-class
counts (the reference's ClassBalancedRandomSampling / BufferClassTracker
caches, utils/buffer/buffer_utils.py:74-204) live as a device array updated by
scatter-add rather than host-side dicts of Python sets.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ocl_tpu.config import input_size_match, n_classes_match


@struct.dataclass
class BufferState:
    imgs: jnp.ndarray          # [mem_size, H, W, C] float32
    labels: jnp.ndarray        # [mem_size] int32
    current_index: jnp.ndarray  # scalar int32, slots filled (prefix property)
    n_seen_so_far: jnp.ndarray  # scalar int32
    score: jnp.ndarray         # [mem_size] float32 (GSS buffer_score; zeros otherwise)
    class_counts: jnp.ndarray  # [n_classes] int32 counts of labels in filled slots


def init_buffer(mem_size: int, data: str) -> BufferState:
    shape = tuple(input_size_match[data])
    return BufferState(
        imgs=jnp.zeros((mem_size,) + shape, jnp.float32),
        labels=jnp.zeros((mem_size,), jnp.int32),
        current_index=jnp.zeros((), jnp.int32),
        n_seen_so_far=jnp.zeros((), jnp.int32),
        score=jnp.zeros((mem_size,), jnp.float32),
        class_counts=jnp.zeros((n_classes_match[data],), jnp.int32),
    )


def valid_mask(buf: BufferState) -> jnp.ndarray:
    """[mem_size] bool — True for filled slots (slots fill as a prefix)."""
    return jnp.arange(buf.labels.shape[0]) < buf.current_index


def write_slots(buf: BufferState, slot_idx, x, y, write_mask) -> BufferState:
    """Overwrite `slot_idx[i]` with (x[i], y[i]) where write_mask[i].

    Maintains class_counts: decrement the evicted label if the slot was
    filled, increment the incoming label. Duplicate slot indices must not
    occur among masked-on entries (strategies guarantee this).
    """
    mem = buf.labels.shape[0]
    safe_idx = jnp.where(write_mask, slot_idx, mem)  # out-of-range drops the write
    old_labels = buf.labels[jnp.clip(slot_idx, 0, mem - 1)]
    was_filled = (slot_idx < buf.current_index) & write_mask

    counts = buf.class_counts
    counts = counts.at[jnp.where(was_filled, old_labels, counts.shape[0])].add(
        -1, mode="drop")
    counts = counts.at[jnp.where(write_mask, y, counts.shape[0])].add(1, mode="drop")

    imgs = buf.imgs.at[safe_idx].set(x, mode="drop")
    labels = buf.labels.at[safe_idx].set(y, mode="drop")
    return buf.replace(imgs=imgs, labels=labels, class_counts=counts)
