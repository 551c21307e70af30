"""Checkpoint/resume of the full train state.

The reference defines save_model but never calls it (reference
utils/io.py:36-45; SURVEY.md §5.4) — checkpointing is a new first-class
subsystem here: the whole TrainState pytree (params, optimizer state,
on-device memory buffer, agent state, RNG key) plus the host-side stream
cursor persists via orbax, enabling crash-resume of a run mid-stream.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state, host_meta: dict | None = None):
    """Write the TrainState + host metadata (task cursor, label bookkeeping)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "state"), jax.device_get(state), force=True)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump(host_meta or {}, f)


def load_checkpoint(path: str, target_state) -> tuple[Any, dict]:
    """Restore (state, host_meta); `target_state` supplies the pytree shape."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.join(path, "state"),
                             item=jax.device_get(target_state))
    state = jax.tree_util.tree_map(
        lambda t, r: jax.device_put(np.asarray(r)), target_state, restored)
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    return state, meta


def snapshot_agent_meta(agent) -> dict:
    return {
        "old_labels": list(agent.old_labels),
        "new_labels_zombie": list(getattr(agent, "new_labels_zombie", [])),
        "task_seen": agent.task_seen,
        "class_task_map": dict(agent.class_task_map),
        "compact": dict(getattr(agent, "compact", {})),
    }


def restore_agent_meta(agent, meta: dict):
    agent.old_labels = list(meta.get("old_labels", []))
    agent.new_labels_zombie = list(meta.get("new_labels_zombie", []))
    agent.task_seen = int(meta.get("task_seen", 0))
    agent.class_task_map = dict(meta.get("class_task_map", {}))
    if hasattr(agent, "compact"):
        agent.compact = dict(meta.get("compact", {}))
