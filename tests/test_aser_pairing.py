"""ASER update pairing semantics with injected Shapley values.

Reference aser_update.py:43-112: after sorting candidates by summed SV
descending, incoming items landing in the 'kept' segment replace buffered
candidates landing in the 'dropped' segment. Injecting a crafted SV matrix
makes the expected replacement deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np

import ocl_tpu.buffer.aser as aser_mod
from ocl_tpu.buffer import build_update
from ocl_tpu.buffer.reservoir import reservoir_update
from ocl_tpu.config import default_params
from ocl_tpu.registry import agents
from ocl_tpu.buffer.state import init_buffer


def test_aser_update_replaces_low_sv_buffered_with_high_sv_incoming(monkeypatch):
    p = default_params(data="synthetic", agent="ER", update="ASER",
                       retrieve="random", mem_size=20, eps_mem_batch=5,
                       verbose=False, nf=4, k=2, n_smp_cls=1.0, batch=4)
    agent = agents["ER"](p)

    def fake_knn_sv(ef, ey, emask, cf, cy, cmask, k):
        # SV proportional to the candidate's pixel stamp: incoming items
        # (stamped 100+) always outrank buffered ones (stamped < 50)
        stamp = cf[:, 0]
        return jnp.where(cmask, stamp, -jnp.inf)[None, :] * jnp.ones(
            (ef.shape[0], 1))

    monkeypatch.setattr(aser_mod, "knn_sv", fake_knn_sv)
    update = build_update(agent)

    # fill the buffer with stamped images (stamp i at slot i)
    buf = init_buffer(20, "synthetic")
    for i in range(2):
        x = jnp.tile(jnp.arange(10 * i, 10 * i + 10, dtype=jnp.float32)
                     [:, None, None, None], (1, 32, 32, 3))
        y = jnp.arange(10 * i, 10 * i + 10, dtype=jnp.int32) % 10
        buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(i))
    assert int(buf.current_index) == 20

    state = agent.init_state(jax.random.PRNGKey(0))
    x_new = jnp.tile(jnp.arange(100, 104, dtype=jnp.float32)
                     [:, None, None, None], (1, 32, 32, 3))
    y_new = jnp.asarray([1, 2, 3, 4], jnp.int32)
    new_buf, _ = jax.jit(update)(state.params, state.batch_stats, buf,
                                 x_new, y_new, jax.random.PRNGKey(7))

    stamps = np.asarray(new_buf.imgs[:, 0, 0, 0])
    # all 4 incoming items (stamps >= 100) were inserted
    assert (stamps >= 100).sum() == 4
    # counts stay consistent
    labels = np.asarray(new_buf.labels)
    counts = np.asarray(new_buf.class_counts)
    for c in range(10):
        assert counts[c] == (labels == c).sum()
    assert int(new_buf.n_seen_so_far) == 20 + 4
