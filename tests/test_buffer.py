"""Buffer strategy tests against hand-computed / statistical oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocl_tpu.buffer.reservoir import reservoir_update

pytestmark = pytest.mark.smoke
from ocl_tpu.buffer.retrieve import class_balanced_sample, random_retrieve
from ocl_tpu.buffer.state import init_buffer, valid_mask


def _mini_buffer(mem=20, data="synthetic"):
    return init_buffer(mem, data)


def _batch(n, label_start=0, seed=0):
    g = np.random.RandomState(seed)
    x = jnp.asarray(g.rand(n, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.arange(label_start, label_start + n) % 10, jnp.int32)
    return x, y


def test_reservoir_sequential_fill():
    buf = _mini_buffer()
    x, y = _batch(10)
    buf, replaced = reservoir_update(buf, x, y, jax.random.PRNGKey(0))
    assert int(buf.current_index) == 10
    assert int(buf.n_seen_so_far) == 10
    np.testing.assert_array_equal(np.asarray(replaced), np.arange(10))
    np.testing.assert_array_equal(np.asarray(buf.labels[:10]), np.asarray(y))
    np.testing.assert_allclose(np.asarray(buf.imgs[:10]), np.asarray(x))
    # class counts track labels
    assert int(buf.class_counts.sum()) == 10


def test_reservoir_overflow_statistics():
    """After streaming N >> mem items, each item has ~mem/N retention odds."""
    mem, n_stream = 50, 1000
    buf = init_buffer(mem, "synthetic")
    rng = jax.random.PRNGKey(42)
    upd = jax.jit(reservoir_update)
    marks = []
    for i in range(n_stream // 10):
        rng, sub = jax.random.split(rng)
        x = jnp.full((10, 32, 32, 3), i, jnp.float32)
        y = jnp.full((10,), i % 10, jnp.int32)
        buf, _ = upd(buf, x, y, sub)
    assert int(buf.current_index) == mem
    assert int(buf.n_seen_so_far) == n_stream
    assert int(buf.class_counts.sum()) == mem
    # every retained image's batch-id stamp should be spread over the stream,
    # not clustered at the end (reservoir property)
    stamps = np.asarray(buf.imgs[:, 0, 0, 0])
    assert stamps.mean() > 20 and stamps.mean() < 80
    # class counts consistent with labels array
    labels = np.asarray(buf.labels)
    for c in range(10):
        assert int(buf.class_counts[c]) == int((labels == c).sum())


def test_random_retrieve_masks_and_uniformity():
    buf = _mini_buffer()
    x, y = _batch(10)
    buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(0))
    # request more than available -> mask reflects shortfall
    mx, my, idx, mask = random_retrieve(buf, 15, jax.random.PRNGKey(1))
    assert mx.shape[0] == 15
    assert int(mask.sum()) == 10
    chosen = np.asarray(idx)[np.asarray(mask)]
    assert len(set(chosen.tolist())) == 10  # without replacement
    assert chosen.max() < 10  # only filled slots


def test_random_retrieve_exclusions():
    buf = _mini_buffer()
    x, y = _batch(10)
    buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(0))
    excl = jnp.zeros(20, bool).at[jnp.arange(5)].set(True)
    _, _, idx, mask = random_retrieve(buf, 10, jax.random.PRNGKey(3), excl_mask=excl)
    chosen = np.asarray(idx)[np.asarray(mask)]
    assert int(mask.sum()) == 5
    assert chosen.min() >= 5


def test_class_balanced_sample():
    buf = init_buffer(40, "synthetic")
    # fill with 4 classes x 10 samples
    for c in range(4):
        x = jnp.full((10, 32, 32, 3), c, jnp.float32)
        y = jnp.full((10,), c, jnp.int32)
        buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(c))
    sx, sy, idx, mask = class_balanced_sample(buf, 3, jax.random.PRNGKey(9))
    assert sx.shape[0] == 10 * 3  # n_classes(synthetic)=10 rows of 3
    sy = np.asarray(sy)[np.asarray(mask)]
    for c in range(4):
        assert (sy == c).sum() == 3
    for c in range(4, 10):
        assert (sy == c).sum() == 0


def test_valid_mask_prefix():
    buf = _mini_buffer()
    x, y = _batch(7)
    buf, _ = reservoir_update(buf, x[:7], y[:7], jax.random.PRNGKey(0))
    vm = np.asarray(valid_mask(buf))
    assert vm[:7].all() and not vm[7:].any()


def test_match_labels_distinct_within_class():
    from ocl_tpu.buffer.match import match_labels

    buf = init_buffer(40, "synthetic")
    for c in range(4):
        x = jnp.full((8, 32, 32, 3), c, jnp.float32)
        y = jnp.full((8,), c, jnp.int32)
        buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(c))
    want = jnp.asarray([1, 1, 1, 2, 3, 3], jnp.int32)
    idx, ok = match_labels(buf, 10, want, jax.random.PRNGKey(9))
    assert bool(ok)
    labels = np.asarray(buf.labels)[np.asarray(idx)]
    np.testing.assert_array_equal(labels, np.asarray(want))
    # within-class picks are distinct (without replacement)
    idx = np.asarray(idx)
    for c in (1, 3):
        picks = idx[np.asarray(want) == c]
        assert len(set(picks.tolist())) == len(picks)


def test_match_labels_insufficient_class_fails():
    from ocl_tpu.buffer.match import match_labels

    buf = init_buffer(40, "synthetic")
    x = jnp.zeros((2, 32, 32, 3))
    y = jnp.zeros((2,), jnp.int32)
    buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(0))
    # ask for 3 of class 0 when only 2 exist -> whole retrieval invalid
    _, ok = match_labels(buf, 10, jnp.asarray([0, 0, 0], jnp.int32),
                         jax.random.PRNGKey(1))
    assert not bool(ok)


def test_buffer_tracker_check(capsys):
    """--buffer_tracker consistency check (reference BufferClassTracker
    .check_tracker): class_counts equals a recomputed label histogram."""
    from types import SimpleNamespace

    from ocl_tpu.experiment.run import _check_buffer_tracker

    buf = _mini_buffer()
    x, y = _batch(10)
    buf, _ = reservoir_update(buf, x, y, jax.random.PRNGKey(0))
    state = SimpleNamespace(buffer=buf)
    _check_buffer_tracker(state)
    out = capsys.readouterr().out
    assert "[buffer_tracker] total 10" in out
    assert "MISMATCH" not in out

    # corrupt the counts -> the check reports the drift
    state.buffer = buf.replace(class_counts=buf.class_counts.at[0].add(1))
    _check_buffer_tracker(state)
    out = capsys.readouterr().out
    assert "MISMATCH" in out
