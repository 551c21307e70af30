"""Augmentation pipeline sanity (reference kornia stack, agents/scr.py:18-24)."""

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.ops import augment


def _imgs(n=64, hw=16):
    g = np.random.RandomState(0)
    return jnp.asarray(g.rand(n, hw, hw, 3), jnp.float32)


def test_random_hflip_rate_and_content():
    x = _imgs()
    out = np.asarray(augment.random_hflip(jax.random.PRNGKey(0), x))
    xn = np.asarray(x)
    flipped = np.array([np.allclose(out[i], xn[i, :, ::-1, :]) for i in range(len(xn))])
    same = np.array([np.allclose(out[i], xn[i]) for i in range(len(xn))])
    assert (flipped | same).all()
    assert 0.25 < flipped.mean() < 0.75  # p=0.5


def test_random_resized_crop_range_and_shape():
    x = _imgs()
    out = np.asarray(augment.random_resized_crop(jax.random.PRNGKey(1), x))
    assert out.shape == x.shape
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5
    # crops differ from the originals for most images
    changed = np.mean([not np.allclose(out[i], np.asarray(x)[i], atol=1e-3)
                       for i in range(len(out))])
    assert changed > 0.9


def test_random_grayscale():
    x = _imgs()
    out = np.asarray(augment.random_grayscale(jax.random.PRNGKey(2), x, p=1.0))
    np.testing.assert_allclose(out[..., 0], out[..., 1], rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], out[..., 2], rtol=1e-5)
    want = np.asarray(x) @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(out[..., 0], want, rtol=1e-4, atol=1e-5)


def test_hsv_roundtrip():
    x = _imgs(8)
    back = np.asarray(augment.hsv_to_rgb(augment.rgb_to_hsv(x)))
    np.testing.assert_allclose(back, np.asarray(x), rtol=1e-3, atol=1e-4)


def test_color_jitter_bounds_and_gate():
    x = _imgs()
    out = np.asarray(augment.color_jitter(jax.random.PRNGKey(3), x))
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5
    # p=0: identity
    out0 = np.asarray(augment.color_jitter(jax.random.PRNGKey(3), x, p=0.0))
    np.testing.assert_allclose(out0, np.asarray(x))


def test_scr_transform_is_random_per_call():
    x = _imgs(16)
    a = np.asarray(augment.scr_transform(jax.random.PRNGKey(4), x))
    b = np.asarray(augment.scr_transform(jax.random.PRNGKey(5), x))
    assert not np.allclose(a, b)
    assert a.shape == x.shape
