"""Buffer strategy registry and dispatch.

Mirrors the reference's update/retrieve registries
(utils/name_match.py:42-55) as builders of pure functions:

  retrieve(params, batch_stats, buffer, batch_x, batch_y, batch_grads, rng)
      -> (mem_x, mem_y, mem_mask, batch_stats)
(retrieval returns batch_stats so strategies whose scoring forwards fold BN
statistics into the live model — the reference MIR's train-mode no_grad
forwards, mir_retrieve.py:23-27 — can reproduce that side effect; all other
strategies pass stats through unchanged)
  update(params, batch_stats, buffer, batch_x, batch_y, rng)
      -> (buffer, replaced_slots)
"""

from __future__ import annotations

from ocl_tpu.buffer.state import BufferState, init_buffer, valid_mask  # noqa: F401
from ocl_tpu.buffer.reservoir import reservoir_update
from ocl_tpu.buffer.retrieve import class_balanced_sample, random_retrieve, sample_slots  # noqa: F401


def build_update(agent):
    name = agent.params.update
    if agent.params.mem_size == 0:
        import jax.numpy as jnp

        def update(params, stats, buf, x, y, rng):
            return buf, jnp.full((x.shape[0],), -1)

        return update
    if name == "random":
        def update(params, stats, buf, x, y, rng):
            return reservoir_update(buf, x, y, rng)

        return update
    if name == "GSS":
        from ocl_tpu.buffer.gss import build_gss_update

        return build_gss_update(agent)
    if name == "ASER":
        from ocl_tpu.buffer.aser import build_aser_update

        return build_aser_update(agent)
    raise KeyError(f"unknown update method: {name}")


def build_retrieve(agent):
    name = agent.params.retrieve
    k = agent.params.eps_mem_batch
    if k == 0 or agent.params.mem_size == 0:
        # finetune baseline (reference config_CVPR/agent/er/finetune.yml:
        # mem_size 0, eps_mem_batch 0): retrieval is always empty. A 1-wide
        # all-masked slice keeps downstream shapes compilable.
        import jax.numpy as jnp

        def retrieve(params, stats, buf, x, y, grads, rng):
            shape = (1,) + buf.imgs.shape[1:]
            return (jnp.zeros(shape, jnp.float32), jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1,), bool), stats)

        return retrieve
    if name == "random":
        def retrieve(params, stats, buf, x, y, grads, rng):
            mx, my, _, mask = random_retrieve(buf, k, rng)
            return mx, my, mask, stats

        return retrieve
    if name == "MIR":
        from ocl_tpu.buffer.mir import build_mir_retrieve

        return build_mir_retrieve(agent)
    if name == "ASER":
        from ocl_tpu.buffer.aser import build_aser_retrieve

        return build_aser_retrieve(agent)
    if name == "match":
        from ocl_tpu.buffer.match import build_match_retrieve

        return build_match_retrieve(agent)
    if name == "mem_match":
        from ocl_tpu.buffer.match import build_mem_match_retrieve

        return build_mem_match_retrieve(agent)
    raise KeyError(f"unknown retrieve method: {name}")
