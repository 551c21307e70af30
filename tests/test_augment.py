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


def test_random_resized_crop_matches_torch_geometry_law():
    """The crop-box law is torchvision/kornia's 10-try REJECTION sampling,
    not clipping (PARITY.md: the clip law biased crops ~7% larger in area
    and produced 2.5x the full-width rate, enough to move the SCR_REVIEW
    parity row out of the +/-1pt band). Pin the geometry distribution via
    constant images: a crop of a constant image is constant, so the output
    equals the input iff geometry doesn't matter — instead recover the box
    from structured inputs."""
    import jax.numpy as jnp

    B, H = 4096, 32
    # encode column index in the red channel, row index in green
    col = jnp.tile(jnp.arange(H, dtype=jnp.float32)[None, :], (H, 1)) / (H - 1)
    row = col.T
    x = jnp.stack([col, row, jnp.zeros_like(col)], -1)[None].repeat(B, 0)
    out = np.asarray(augment.random_resized_crop(jax.random.PRNGKey(7), x))
    # linear-in-index channels survive bilinear resize: the output corner
    # values recover the crop box edges
    x0 = out[:, 0, 0, 0] * (H - 1)
    x1 = out[:, 0, -1, 0] * (H - 1)
    y0 = out[:, 0, 0, 1] * (H - 1)
    y1 = out[:, -1, 0, 1] * (H - 1)
    w = x1 - x0
    h = y1 - y0
    area_frac = (w * h) / ((H - 1) * (H - 1))
    # torchvision law at scale=(0.2,1), ratio=(3/4,4/3) on 32x32 (measured
    # over 20k samples in tools/probe_aug_parity.py): area fraction
    # 0.553 +/- 0.206, P(full width) 0.039. The legacy clip law sat at
    # 0.593 / 0.098 — well outside these bands.
    assert 0.52 < float(area_frac.mean()) < 0.585
    full_w = float((w > (H - 2.0)).mean())
    assert full_w < 0.07
    # aspect ratio bounded by the sampler's (3/4, 4/3) up to rounding
    ratio = (w + 1) / (h + 1)
    assert float(ratio.min()) > 0.65 and float(ratio.max()) < 1.55


def test_crop_resize_matches_torch_interpolate():
    """crop_resize == torch crop-then-F.interpolate, INCLUDING the border
    ring: torch hard-slices the box, so resize edge-replication must never
    blend in pixels from outside the box. The pre-fix sampler walked the
    full image at box coords and leaked out-of-box neighbors into border
    output pixels (up to 0.21/channel on 32x32) — the SCR_REVIEW act-three
    suspect (PARITY.md). Reference aug: kornia RandomResizedCrop
    (agents/scr.py:18-24), whose resize is align_corners=False bilinear."""
    import torch
    import torch.nn.functional as F

    g = np.random.RandomState(3)
    x = g.rand(32, 32, 3).astype(np.float32)
    for y0, x0, h, w in [(0, 0, 32, 32), (5, 9, 13, 17), (0, 3, 7, 29),
                         (25, 25, 7, 7), (2, 2, 28, 3), (31, 0, 1, 32)]:
        ours = np.asarray(augment.crop_resize(jnp.asarray(x), y0, x0, h, w))
        crop = torch.from_numpy(x[y0:y0 + h, x0:x0 + w]).permute(2, 0, 1)[None]
        want = F.interpolate(crop, size=(32, 32), mode="bilinear",
                             align_corners=False)[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"box {(y0, x0, h, w)}")


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
