"""Quantify augmentation-distribution parity: jnp pipeline vs the oracle.

The SCR parity rows compare ocl_tpu's jnp augmentations (ops/augment.py)
against the oracle's functional torch stubs of kornia
(tools/ref_oracle.py) — augmentation parity is distributional, not exact
(PARITY.md). This probe measures how close the distributions actually are:

1. Crop geometry: samples (h, w, area-fraction) from
     a) the jnp random_resized_crop (rejection-sampling, current),
     b) a legacy clip-variant (what ocl shipped before the fix: oversized
        boxes clipped to the image — biases crops larger),
     c) the oracle's torch RandomResizedCrop stub (10-try rejection, the
        same law torchvision/kornia implement).
   and reports mean/std of the area fraction plus the full-size rate.

2. Full-pipeline pixel moments: mean/std of scr_transform outputs vs the
   stub pipeline on the same inputs (distribution-level agreement).

Usage: env JAX_PLATFORMS=cpu python tools/probe_aug_parity.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 20000
HW = 32
SCALE = (0.2, 1.0)
RATIO = (3.0 / 4.0, 4.0 / 3.0)


def jnp_box_stats(rejection=True):
    import jax
    import jax.numpy as jnp

    B, H, W, tries = N, HW, HW, 10
    r_box = jax.random.PRNGKey(0)
    area = jax.random.uniform(r_box, (B, tries),
                              minval=SCALE[0], maxval=SCALE[1]) * H * W
    log_r = jax.random.uniform(jax.random.fold_in(r_box, 1), (B, tries),
                               minval=np.log(RATIO[0]), maxval=np.log(RATIO[1]))
    r = jnp.exp(log_r)
    w_c = jnp.round(jnp.sqrt(area * r))
    h_c = jnp.round(jnp.sqrt(area / r))
    if rejection:
        valid = (w_c >= 1) & (w_c <= W) & (h_c >= 1) & (h_c <= H)
        first = jnp.argmax(valid, axis=1)
        any_valid = jnp.any(valid, axis=1)
        rows = jnp.arange(B)
        w = jnp.where(any_valid, w_c[rows, first], W)
        h = jnp.where(any_valid, h_c[rows, first], H)
    else:  # the legacy clip law
        w = jnp.clip(w_c[:, 0], 1, W)
        h = jnp.clip(h_c[:, 0], 1, H)
    return np.asarray(h, float), np.asarray(w, float)


def torch_stub_box_stats():
    import torch

    torch.manual_seed(0)
    h_out, w_out = [], []
    H = W = HW
    for _ in range(N):
        for _t in range(10):
            area = H * W * float(torch.empty(1).uniform_(*SCALE))
            log_r = torch.empty(1).uniform_(np.log(RATIO[0]), np.log(RATIO[1]))
            ratio = float(torch.exp(log_r))
            cw = int(round(np.sqrt(area * ratio)))
            ch = int(round(np.sqrt(area / ratio)))
            if 0 < cw <= W and 0 < ch <= H:
                break
        else:
            ch, cw = H, W
        h_out.append(ch)
        w_out.append(cw)
    return np.asarray(h_out, float), np.asarray(w_out, float)


def summarize(name, h, w):
    af = (h * w) / (HW * HW)
    row = dict(name=name, area_frac_mean=round(float(af.mean()), 4),
               area_frac_std=round(float(af.std()), 4),
               p_full_width=round(float((w >= HW).mean()), 4),
               p_full_height=round(float((h >= HW).mean()), 4),
               h_mean=round(float(h.mean()), 3), w_mean=round(float(w.mean()), 3))
    print("| {name} | {area_frac_mean} ± {area_frac_std} | {p_full_width} | "
          "{h_mean}x{w_mean} |".format(**row))
    return row


def pixel_moments():
    """Full scr_transform vs the stub pipeline on identical inputs."""
    import jax

    from ocl_tpu.ops.augment import scr_transform

    rs = np.random.RandomState(0)
    x = rs.rand(256, HW, HW, 3).astype(np.float32)

    outs = [np.asarray(scr_transform(jax.random.PRNGKey(i), x))
            for i in range(8)]
    jnp_mean = float(np.mean(outs))
    jnp_std = float(np.std(outs))

    import ref_oracle

    ref_oracle.ensure_reference_importable()
    import torch
    from kornia import augmentation as K

    torch.manual_seed(0)
    pipe = torch.nn.Sequential(
        K.RandomResizedCrop(size=(HW, HW), scale=(0.2, 1.0)),
        K.RandomHorizontalFlip(),
        K.ColorJitter(0.4, 0.4, 0.4, 0.1, p=0.8),
        K.RandomGrayscale(p=0.2))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        touts = [pipe(xt).numpy() for _ in range(8)]
    t_mean = float(np.mean(touts))
    t_std = float(np.std(touts))
    print("\npixel moments over 8 draws x 256 imgs:")
    print("  jnp scr_transform  mean {:.4f} std {:.4f}".format(jnp_mean, jnp_std))
    print("  oracle stub        mean {:.4f} std {:.4f}".format(t_mean, t_std))
    return dict(jnp_mean=jnp_mean, jnp_std=jnp_std,
                stub_mean=t_mean, stub_std=t_std)


def hue_law_stats():
    """Isolated hue-op divergence: the three candidate laws on the same
    pixels and the same sampled factors hf ~ U(-0.1, 0.1).

    * turns     — ocl's default: HSV rotation by hf turns (torchvision law)
    * radians   — kornia-0.4.1 semantics: HSV rotation by hf/2π turns
    * rollblend — the oracle stub's approximation: blend |hf| of the
                  channel-rolled image (desaturates; hue rotation doesn't)
    """
    import jax
    import jax.numpy as jnp

    from ocl_tpu.ops.augment import rgb_to_hsv, hsv_to_rgb

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2048, 8, 8, 3).astype(np.float32))
    hf = jax.random.uniform(jax.random.PRNGKey(0), (2048, 1, 1),
                            minval=-0.1, maxval=0.1)

    def rotate(shift):
        hsv = rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
        return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)

    f = jnp.abs(hf)[..., None]
    laws = {
        "turns": rotate(hf),
        "radians": rotate(hf / (2.0 * np.pi)),
        "rollblend": jnp.clip((1 - f) * x + f * jnp.roll(x, 1, axis=-1),
                              0.0, 1.0),
    }
    s0 = float(jnp.mean(rgb_to_hsv(x)[..., 1]))
    rows = {}
    print("\nhue-op divergence (same pixels, same hf ~ U(-0.1, 0.1)):")
    print("| law | mean |dpx| | std dpx | mean saturation (orig {:.4f}) |".format(s0))
    print("|---|---|---|---|")
    for name, y in laws.items():
        d = y - x
        rows[name] = dict(
            mean_abs_dpx=round(float(jnp.mean(jnp.abs(d))), 4),
            std_dpx=round(float(jnp.std(d)), 4),
            sat_mean=round(float(jnp.mean(rgb_to_hsv(y)[..., 1])), 4))
        r = rows[name]
        print("| {} | {} | {} | {} |".format(
            name, r["mean_abs_dpx"], r["std_dpx"], r["sat_mean"]))
    rows["orig_sat_mean"] = round(s0, 4)
    return rows


def main():
    from ocl_tpu.config import apply_platform_env

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    apply_platform_env()

    print("crop geometry over {} samples, {}x{}, scale {} ratio {}:".format(
        N, HW, HW, SCALE, RATIO))
    print("| law | area frac | P(w=W) | mean hxw |")
    print("|---|---|---|---|")
    rows = [summarize("jnp rejection (current)", *jnp_box_stats(True)),
            summarize("jnp clip (legacy)", *jnp_box_stats(False)),
            summarize("oracle torch stub (torchvision law)",
                      *torch_stub_box_stats())]
    out = dict(crop_geometry=rows, pixels=pixel_moments(),
               hue_laws=hue_law_stats())
    path = os.path.join(REPO, "results", "aug_parity_probe.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
