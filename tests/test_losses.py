"""Numerical cross-checks of losses against torch-free NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from ocl_tpu.ops import losses


def _np_softmax(z):
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_cross_entropy_matches_numpy():
    g = np.random.RandomState(0)
    logits = g.randn(6, 5).astype(np.float32)
    labels = g.randint(0, 5, 6)
    p = _np_softmax(logits)
    expected = -np.mean(np.log(p[np.arange(6), labels]))
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_cross_entropy_mask():
    g = np.random.RandomState(1)
    logits = g.randn(6, 5).astype(np.float32)
    labels = g.randint(0, 5, 6)
    mask = np.array([1, 1, 1, 0, 0, 0], bool)
    p = _np_softmax(logits)
    expected = -np.mean(np.log(p[np.arange(3), labels[:3]]))
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                     mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_labels_trick_restricts_support():
    g = np.random.RandomState(2)
    logits = g.randn(4, 10).astype(np.float32)
    labels = np.array([2, 2, 7, 7])
    sub = logits[:, [2, 7]]
    p = _np_softmax(sub)
    remap = np.array([0, 0, 1, 1])
    expected = -np.mean(np.log(p[np.arange(4), remap]))
    got = float(losses.labels_trick_ce(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_separated_softmax():
    g = np.random.RandomState(3)
    logits = g.randn(4, 6).astype(np.float32)
    old = np.array([True, True, False, False, False, False])
    new = np.array([False, False, True, True, False, False])
    labels = np.array([0, 1, 2, 3])
    p_old = _np_softmax(logits[:, :2])
    p_new = _np_softmax(logits[:, 2:4])
    expected = -np.mean([np.log(p_old[0, 0]), np.log(p_old[1, 1]),
                         np.log(p_new[2, 0]), np.log(p_new[3, 1])])
    got = float(losses.separated_softmax_ce(jnp.asarray(logits), jnp.asarray(labels),
                                            jnp.asarray(old), jnp.asarray(new)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_kd_loss_oracle():
    g = np.random.RandomState(4)
    s = g.randn(5, 7).astype(np.float32)
    t = g.randn(5, 7).astype(np.float32)
    T = 2.0
    p_t = _np_softmax(t / T)
    log_s = np.log(_np_softmax(s / T))
    expected = np.mean(np.sum(-p_t * log_s, axis=1)) * T * T
    got = float(losses.kd_loss(jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def _np_supcon(features, labels, temperature):
    """Oracle following reference utils/loss.py:19-96 (contrast_mode='all')."""
    bsz, n_views, d = features.shape
    contrast = np.concatenate([features[:, v] for v in range(n_views)], axis=0)
    anchor = contrast
    sim = anchor @ contrast.T / temperature
    sim = sim - sim.max(axis=1, keepdims=True)
    lab = np.tile(labels, n_views)
    mask = (lab[:, None] == lab[None, :]).astype(np.float64)
    logits_mask = 1.0 - np.eye(bsz * n_views)
    mask *= logits_mask
    exp_sim = np.exp(sim) * logits_mask
    log_prob = sim - np.log(exp_sim.sum(axis=1, keepdims=True))
    mlpp = (mask * log_prob).sum(1) / mask.sum(1)
    return float(np.mean(-mlpp))


def test_supcon_matches_reference_math():
    g = np.random.RandomState(5)
    f = g.randn(6, 2, 8)
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 2, 2])
    expected = _np_supcon(f, labels, 0.07)
    got = float(losses.supcon_loss(jnp.asarray(f, jnp.float32), jnp.asarray(labels), 0.07))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_supcon_mask_equals_smaller_batch():
    g = np.random.RandomState(6)
    f = g.randn(6, 2, 8).astype(np.float32)
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 2, 2])
    full = float(losses.supcon_loss(jnp.asarray(f[:4]), jnp.asarray(labels[:4]), 0.1))
    mask = np.array([1, 1, 1, 1, 0, 0], bool)
    masked = float(losses.supcon_loss(jnp.asarray(f), jnp.asarray(labels), 0.1,
                                      mask=jnp.asarray(mask)))
    np.testing.assert_allclose(masked, full, rtol=1e-4)


def test_bce_ohe_oracle():
    g = np.random.RandomState(7)
    logits = g.randn(4, 5).astype(np.float32)
    targets = (g.rand(4, 5) > 0.5).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    expected = float(np.mean(np.sum(
        -(targets * np.log(p) + (1 - targets) * np.log(1 - p)), axis=1)))
    got = float(losses.bce_ohe(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)
