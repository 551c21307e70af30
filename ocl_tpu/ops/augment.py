"""Image augmentations as pure jnp ops, fused into the jitted train step.

Counterpart of the reference SCR pipeline (reference agents/scr.py:18-24:
kornia RandomResizedCrop(scale=(0.2,1)) -> RandomHorizontalFlip ->
ColorJitter(0.4,0.4,0.4,0.1, p=0.8) -> RandomGrayscale(p=0.2)).

All ops are batched, fixed-shape, vmap-friendly: crops are bilinear gather
sampling (no dynamic slice sizes). Jitter sub-ops apply in a random order
sampled per batch (kornia semantics), via lax.switch over the four sub-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(img, ys, xs):
    """Sample img [H,W,C] at float coords (ys [h], xs [w]) -> [h,w,C]."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ay = (ys - y0)[:, None, None]
    ax = (xs - x0)[None, :, None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    g = lambda yi, xi: img[yi[:, None], xi[None, :]]  # noqa: E731
    top = g(y0, x0) * (1 - ax) + g(y0, x1) * ax
    bot = g(y1, x0) * (1 - ax) + g(y1, x1) * ax
    return top * (1 - ay) + bot * ay


def crop_resize(img, y0, x0, h, w):
    """Crop box (y0,x0,h,w) and resize back to img's own HxW, bilinearly
    (half-pixel centers == align_corners=False).

    Coords are CLAMPED to the box ([y0, y0+h-1] x [x0, x0+w-1]): torch
    crops first (a hard slice) and interpolates the slice with edge
    replication, so border output pixels must never blend in image pixels
    from OUTSIDE the box. Sampling the full image without the clamp leaked
    out-of-box neighbors into the border ring (up to 0.21 per channel on
    32x32 crops) — bit-parity with F.interpolate(crop) is pinned in
    tests/test_augment.py."""
    H, W = img.shape[0], img.shape[1]
    ys = jnp.clip(y0 + (jnp.arange(H) + 0.5) * h / H - 0.5, y0, y0 + h - 1)
    xs = jnp.clip(x0 + (jnp.arange(W) + 0.5) * w / W - 0.5, x0, x0 + w - 1)
    return bilinear_sample(img, ys, xs)


def random_resized_crop(rng, x, scale=(0.2, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                        tries=10):
    """Per-sample random area/aspect crop, resized to the input size.

    Matches torchvision/kornia crop-geometry semantics (the reference's
    RandomResizedCrop, agents/scr.py:18-24): 10-try REJECTION sampling of
    (area, log-ratio) with whole-image fallback, and integer box sizes and
    offsets. Rejection, not clipping: clipping oversized boxes to the image
    biases ~10-15%% of crops larger (milder augmentation) at the SCR scale
    range — a measurable distribution shift (tools/probe_aug_parity.py).
    Vectorized: all `tries` candidates are sampled at once and the first
    valid one is selected per sample."""
    B, H, W, _ = x.shape
    r_box, r_y, r_x = jax.random.split(rng, 3)
    area = jax.random.uniform(r_box, (B, tries),
                              minval=scale[0], maxval=scale[1]) * H * W
    log_r = jax.random.uniform(jax.random.fold_in(r_box, 1), (B, tries),
                               minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    w_c = jnp.round(jnp.sqrt(area * r))
    h_c = jnp.round(jnp.sqrt(area / r))
    valid = (w_c >= 1) & (w_c <= W) & (h_c >= 1) & (h_c <= H)
    first = jnp.argmax(valid, axis=1)
    any_valid = jnp.any(valid, axis=1)
    rows = jnp.arange(B)
    w = jnp.where(any_valid, w_c[rows, first], W)
    h = jnp.where(any_valid, h_c[rows, first], H)
    # integer offsets, uniform over [0, H-h] (torch randint semantics)
    y0 = jnp.floor(jax.random.uniform(r_y, (B,)) * (H - h + 1))
    x0 = jnp.floor(jax.random.uniform(r_x, (B,)) * (W - w + 1))
    return jax.vmap(crop_resize)(x, y0, x0, h, w)


def random_hflip(rng, x, p=0.5):
    flip = jax.random.uniform(rng, (x.shape[0],)) < p
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def rgb_to_grayscale(x):
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def random_grayscale(rng, x, p=0.2):
    gray = jnp.repeat(rgb_to_grayscale(x), 3, axis=-1)
    on = jax.random.uniform(rng, (x.shape[0],)) < p
    return jnp.where(on[:, None, None, None], gray, x)


def rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(mx == r, (g - b) / safe_d % 6.0,
                  jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(rng, x, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1, p=0.8,
                 hue_law="turns"):
    """kornia ColorJitter: per-sample factors, sub-ops applied in a random
    order sampled once per batch (kornia ColorJitter forward shuffles
    [brightness, contrast, saturation, hue] per call).

    hue_law selects how the sampled hue factor hf ~ U(-hue, hue) is applied
    (tools/probe_scr_hue_law.py measures the accuracy effect on SCR rows):

    * "turns"     — torchvision semantics: shift normalized HSV hue by hf
                    (hf in fractions of the color circle). The default.
    * "radians"   — kornia 0.4.x semantics (the reference pins
                    kornia==0.4.1): adjust_hue consumes the factor as
                    RADIANS (shift = hf / 2π), so ColorJitter(..., hue=0.1)
                    rotates hue by at most 0.1 rad ≈ 0.016 turns — a ~6×
                    weaker augmentation than torchvision's law.
    * "rollblend" — the parity oracle stub's cheap approximation
                    (tools/ref_oracle.py): blend |hf| of the channel-rolled
                    image. Same-law control for parity localization.
    """
    B = x.shape[0]
    r_on, r_b, r_c, r_s, r_h, r_ord = jax.random.split(rng, 6)
    on = (jax.random.uniform(r_on, (B,)) < p)[:, None, None, None]

    bf = jax.random.uniform(r_b, (B, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    cf = jax.random.uniform(r_c, (B, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    sf = jax.random.uniform(r_s, (B, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    hf = jax.random.uniform(r_h, (B, 1, 1), minval=-hue, maxval=hue)

    def op_brightness(img):
        return jnp.clip(img * bf, 0.0, 1.0)

    def op_contrast(img):
        mean_gray = jnp.mean(rgb_to_grayscale(img), axis=(1, 2, 3), keepdims=True)
        return jnp.clip(img * cf + mean_gray * (1 - cf), 0.0, 1.0)

    def op_saturation(img):
        gray = rgb_to_grayscale(img)
        return jnp.clip(img * sf + gray * (1 - sf), 0.0, 1.0)

    def op_hue(img):
        if hue_law == "rollblend":
            f = jnp.abs(hf)[..., None]  # (B,1,1,1)
            rolled = jnp.roll(img, shift=1, axis=-1)
            return jnp.clip((1.0 - f) * img + f * rolled, 0.0, 1.0)
        shift = hf / (2.0 * np.pi) if hue_law == "radians" else hf
        hsv = rgb_to_hsv(img)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
        return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)

    ops = (op_brightness, op_contrast, op_saturation, op_hue)
    order = jax.random.permutation(r_ord, 4)
    out = x
    for i in range(4):
        out = jax.lax.switch(order[i], ops, out)

    return jnp.where(on, out, x)


def scr_transform(rng, x, hue_law="turns"):
    """The SCR augmentation stack (reference agents/scr.py:18-24)."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    x = random_resized_crop(r1, x)
    x = random_hflip(r2, x)
    x = color_jitter(r3, x, hue_law=hue_law)
    x = random_grayscale(r4, x)
    return x
