"""CN-DPM: a Dirichlet-process mixture of VAE+classifier experts, static-shape.

Reference models/ndpm/* grows an nn.ModuleList of experts whose encoders
laterally share features with every precursor via channel concat
(vae.py:256-290, classifier.py:48-243). Dynamic growth fights XLA, so here:

  * `max_experts` expert slots are pre-allocated with *stacked* parameters
    ([K, ...] leaves). A slot that has not been "born" yet simply keeps its
    fresh random init — exactly what a newly constructed reference expert
    would have — and an `active` count masks it out of routing/prediction.
  * Channel ragging (first expert nf_base wide, later ones nf_ext) becomes
    padding: every slot's weights take the maximal concat width as input;
    un-written buffer channels are zero so padded weights are inert. Each
    slot's weights are initialized at the slot's *true* fan-in so the init
    distribution matches the reference layer-for-layer.
  * Lateral sharing = one sequentially-written feature buffer per level; the
    carried buffer is stop_gradient'ed so gradients never flow into
    precursors (reference detaches collected features).
  * The classifier uses InstanceNorm (stateless) so the whole mixture is a
    pure function of (params, x, rng).

All widths/offsets are static Python ints per slot; the K-slot loops unroll
at trace time.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ocl_tpu.config import input_size_match, n_classes_match
from ocl_tpu.models import ndpm_vars as V

LOG2PI = math.log(2.0 * math.pi)


# ----------------------------------------------------------------- widths

def vae_w(s):
    return V.VAE_NF_BASE if s == 0 else V.VAE_NF_EXT


def vae_off(s):
    return 0 if s == 0 else V.VAE_NF_BASE + (s - 1) * V.VAE_NF_EXT


def vae_cat(s):
    return V.VAE_NF_BASE + s * V.VAE_NF_EXT


def cls_w(s):
    return V.CLS_NF_BASE if s == 0 else V.CLS_NF_EXT


def cls_off(s):
    return 0 if s == 0 else V.CLS_NF_BASE + (s - 1) * V.CLS_NF_EXT


def cls_cat(s):
    return V.CLS_NF_BASE + s * V.CLS_NF_EXT


# ------------------------------------------------------------------- init

def _uniform(key, shape, fan_in):
    b = 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, jnp.float32, -b, b)


def _conv_init(key, kh, kw, cin_pad, cout_pad, cin_real):
    # torch Conv2d default init at the slot's true fan-in
    k1, k2 = jax.random.split(key)
    w = _uniform(k1, (kh, kw, cin_pad, cout_pad), cin_real * kh * kw)
    b = _uniform(k2, (cout_pad,), cin_real * kh * kw)
    return w, b


def _lin_init(key, din_pad, dout_pad, din_real):
    k1, k2 = jax.random.split(key)
    return (_uniform(k1, (din_pad, dout_pad), din_real),
            _uniform(k2, (dout_pad,), din_real))


def init_ndpm_params(rng, params_ns):
    """Stacked per-slot params + an independent frozen dummy expert."""
    K = int(params_ns.max_experts)
    H, W_, C = input_size_match[params_ns.data]
    n_cls = n_classes_match[params_ns.data]
    Cv = vae_cat(K - 1)
    Cc = cls_cat(K - 1)
    h4, w4 = H // 4, W_ // 4
    fv = h4 * w4 * 2 * Cv
    nfb = V.VAE_NF_BASE

    def one_vae(key, s):
        ks = jax.random.split(key, 10)
        wv, cv = vae_w(s), vae_cat(s)
        p = {}
        p["enc1_w"], p["enc1_b"] = _conv_init(ks[0], 3, 3, C, nfb, C)
        p["enc2_w"], p["enc2_b"] = _conv_init(ks[1], 3, 3, Cv, 2 * nfb, cv)
        p["enc3_w"], p["enc3_b"] = _lin_init(ks[2], fv, 4 * nfb,
                                             h4 * w4 * 2 * cv)
        p["zmu_w"], p["zmu_b"] = _lin_init(ks[3], 4 * Cv, V.VAE_Z_DIM, 4 * cv)
        p["zlv_w"], p["zlv_b"] = _lin_init(ks[4], 4 * Cv, V.VAE_Z_DIM, 4 * cv)
        p["decz_w"], p["decz_b"] = _lin_init(ks[5], V.VAE_Z_DIM, 4 * nfb, V.VAE_Z_DIM)
        p["dec3_w"], p["dec3_b"] = _lin_init(ks[6], 4 * nfb, h4 * w4 * 2 * nfb,
                                             4 * nfb)
        p["dec2_w"], p["dec2_b"] = _conv_init(ks[7], 4, 4, 2 * nfb, nfb, 2 * nfb)
        p["dec1_w"], p["dec1_b"] = _conv_init(ks[8], 4, 4, nfb, C, nfb)
        # enc1/enc2 outs are padded to nf_base / 2*nf_base; real out widths
        # are wv / 2*wv — masked at apply time
        return p

    def one_cls(key, s):
        ks = jax.random.split(key, 16)
        wc, cc = cls_w(s), cls_cat(s)
        nb = V.CLS_NF_BASE
        p = {}
        p["l0_w"], _ = _conv_init(ks[0], 3, 3, C, nb, C)
        # per level: (in_cat_mult, out_mult, stride)
        specs = [(1, 1, 1), (1, 2, 2), (2, 4, 2), (4, 8, 2)]
        for i, (mi, mo, stride) in enumerate(specs, start=1):
            cin_pad, cout_pad = mi * Cc, mo * nb
            cin_real, cout_real = mi * cc, mo * wc
            p[f"l{i}_c1_w"], _ = _conv_init(ks[3 * i], 3, 3, cin_pad, cout_pad,
                                            cin_real)
            p[f"l{i}_c2_w"], _ = _conv_init(ks[3 * i + 1], 3, 3, cout_pad,
                                            cout_pad, cout_real)
            p[f"l{i}_ds_w"], _ = _conv_init(ks[3 * i + 2], 1, 1, cin_pad,
                                            cout_pad, cin_real)
        p["pred_w"], p["pred_b"] = _lin_init(ks[15], 8 * Cc, n_cls, 8 * cc)
        return p

    r_dummy, r_slots = jax.random.split(rng)
    rd1, rd2 = jax.random.split(r_dummy)
    slot_keys = jax.random.split(r_slots, K)
    vaes = [one_vae(jax.random.fold_in(k, 0), s) for s, k in enumerate(slot_keys)]
    clss = [one_cls(jax.random.fold_in(k, 1), s) for s, k in enumerate(slot_keys)]
    stack = lambda ps: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: jnp.stack(xs), *ps)
    return {
        "dummy": {"vae": one_vae(rd1, 0), "cls": one_cls(rd2, 0)},
        "vae": stack(vaes),
        "cls": stack(clss),
    }


# ---------------------------------------------------------------- helpers

def _conv(x, w, b=None, stride=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if b is None else out + b


def _deconv(x, w, b, stride=2):
    out = jax.lax.conv_transpose(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _mask_out(h, width):
    if width == h.shape[-1]:
        return h
    return h * (jnp.arange(h.shape[-1]) < width).astype(h.dtype)


def _slot(tree, s):
    return jax.tree_util.tree_map(lambda a: a[s], tree)


# ----------------------------------------------------------------- VAE

def vae_encode_all(vp, x, K):
    """z_mu/z_lv lists per slot, with lateral buffers (detached carries)."""
    B, H, W_, _ = x.shape
    Cv = vae_cat(K - 1)
    buf1 = jnp.zeros((B, H // 2, W_ // 2, Cv))
    buf2 = jnp.zeros((B, H // 4, W_ // 4, 2 * Cv))
    buf3 = jnp.zeros((B, 4 * Cv))
    z_mus, z_lvs = [], []
    for s in range(K):
        p = _slot(vp, s)
        wv, off = vae_w(s), vae_off(s)
        h1 = _mask_out(jax.nn.relu(_maxpool(_conv(x, p["enc1_w"], p["enc1_b"]))),
                       wv)
        in1 = buf1.at[..., off: off + wv].set(h1[..., :wv])
        h2 = _mask_out(jax.nn.relu(_maxpool(_conv(in1, p["enc2_w"], p["enc2_b"]))),
                       2 * wv)
        in2 = buf2.at[..., 2 * off: 2 * off + 2 * wv].set(h2[..., : 2 * wv])
        h3 = _mask_out(jax.nn.relu(
            in2.reshape(B, -1) @ p["enc3_w"] + p["enc3_b"]), 4 * wv)
        in3 = buf3.at[:, 4 * off: 4 * off + 4 * wv].set(h3[:, : 4 * wv])
        z_mus.append(in3 @ p["zmu_w"] + p["zmu_b"])
        z_lvs.append(in3 @ p["zlv_w"] + p["zlv_b"])
        # precursor features are detached for later experts (reference
        # vae.py collect: features[...].detach())
        buf1 = jax.lax.stop_gradient(in1)
        buf2 = jax.lax.stop_gradient(in2)
        buf3 = jax.lax.stop_gradient(in3)
    return z_mus, z_lvs


def _vae_decode(p, z, out_hw):
    h4, w4 = out_hw[0] // 4, out_hw[1] // 4
    nfb = V.VAE_NF_BASE
    h = jax.nn.relu(z @ p["decz_w"] + p["decz_b"])
    h = jax.nn.relu(h @ p["dec3_w"] + p["dec3_b"])
    h = h.reshape(h.shape[0], h4, w4, 2 * nfb)
    h = jax.nn.relu(_deconv(h, p["dec2_w"], p["dec2_b"]))
    return jax.nn.sigmoid(_deconv(h, p["dec1_w"], p["dec1_b"]))


def _gaussian_recon_nll(x, x_mean, min_noise=0.001):
    """gaussian_nll with log_var=0 (reference models/ndpm/loss.py:7-11)."""
    return ((x - x_mean) ** 2 + min_noise) / 2.0 + 0.5 * LOG2PI


def _vae_nll_from_z(p, z_mu, z_lv, x, rng):
    B = x.shape[0]
    S = V.VAE_Z_SAMPLES
    std = jnp.exp(0.5 * z_lv)
    noise = jax.random.normal(rng, (B, S, z_mu.shape[-1]))
    z = (z_mu[:, None, :] + noise * std[:, None, :]).reshape(B * S, -1)
    x_mean = _vae_decode(p, z, x.shape[1:3]).reshape(B, S, *x.shape[1:])
    recon = _gaussian_recon_nll(x[:, None], x_mean)
    recon = recon.reshape(B, S, -1).sum(2).mean(1)
    kl = 0.5 * jnp.sum(jnp.exp(z_lv) + z_mu ** 2 - 1.0 - z_lv, axis=1)
    return recon + kl


def vae_collect_nll(params, x, rng, K):
    """[B, 1+K]: dummy slot then each expert slot's VAE NLL."""
    z_mus, z_lvs = vae_encode_all(params["vae"], x, K)
    rngs = jax.random.split(rng, K + 1)
    d = params["dummy"]["vae"]
    zd_mu, zd_lv = _dummy_encode(d, x)
    out = [_vae_nll_from_z(d, zd_mu, zd_lv, x, rngs[0])]
    for s in range(K):
        out.append(_vae_nll_from_z(_slot(params["vae"], s), z_mus[s], z_lvs[s],
                                   x, rngs[s + 1]))
    return jnp.stack(out, axis=1)


def _dummy_encode(p, x):
    B = x.shape[0]
    wv = V.VAE_NF_BASE
    h1 = _mask_out(jax.nn.relu(_maxpool(_conv(x, p["enc1_w"], p["enc1_b"]))), wv)
    # dummy weights have the padded widths too; feed zero-padded buffers
    Cv = p["enc2_w"].shape[2]
    in1 = jnp.zeros(h1.shape[:-1] + (Cv,)).at[..., :wv].set(h1[..., :wv])
    h2 = _mask_out(jax.nn.relu(_maxpool(_conv(in1, p["enc2_w"], p["enc2_b"]))),
                   2 * wv)
    in2 = jnp.zeros(h2.shape[:-1] + (2 * Cv,)).at[..., : 2 * wv].set(
        h2[..., : 2 * wv])
    h3 = _mask_out(jax.nn.relu(in2.reshape(B, -1) @ p["enc3_w"] + p["enc3_b"]),
                   4 * wv)
    in3 = jnp.zeros((B, 4 * Cv)).at[:, : 4 * wv].set(h3[:, : 4 * wv])
    return in3 @ p["zmu_w"] + p["zmu_b"], in3 @ p["zlv_w"] + p["zlv_b"]


# ------------------------------------------------------------ classifier

def _cls_block(p, i, x, width_out, stride, has_ds):
    h = _conv(x, p[f"l{i}_c1_w"], stride=stride)
    h = jax.nn.relu(_instance_norm(_mask_out(h, width_out)))
    h = _conv(h, p[f"l{i}_c2_w"])
    h = _instance_norm(_mask_out(h, width_out))
    if has_ds:
        idn = _instance_norm(_mask_out(
            _conv(x, p[f"l{i}_ds_w"], stride=stride), width_out))
    else:
        # identity shortcut exists only when in==out (slot 0, layer 1);
        # that slot's own block sits at offset 0 of the padded buffer
        idn = x[..., : h.shape[-1]]
    return jax.nn.relu(h + idn)


def _cls_forward_slot(p, s, x, bufs, n_cls):
    """One slot's classifier over the current lateral buffers; returns
    (log_softmax [B,C], own-level features to append)."""
    wc, off = cls_w(s), cls_off(s)
    nb = V.CLS_NF_BASE
    h1 = _mask_out(jax.nn.relu(_instance_norm(_conv(x, p["l0_w"]))), wc)
    in1 = bufs[0].at[..., off: off + wc].set(h1[..., :wc])
    specs = [(1, 1, 1), (1, 2, 2), (2, 4, 2), (4, 8, 2)]
    feats = [in1]
    cur = in1
    for i, (mi, mo, stride) in enumerate(specs, start=1):
        width_out = mo * wc
        cin_real = mi * cls_cat(s)
        has_ds = (stride != 1) or (cin_real != width_out)
        h = _cls_block(p, i, cur, width_out, stride, has_ds)
        h = _mask_out(h, width_out)
        if i < 4:
            cur = bufs[i].at[..., mo * off: mo * off + width_out].set(
                h[..., :width_out])
            feats.append(cur)
        else:
            h5 = jnp.mean(h, axis=(1, 2))
            in5 = bufs[4].at[:, 8 * off: 8 * off + 8 * wc].set(h5[:, : 8 * wc])
            feats.append(in5)
    logits = feats[-1] @ p["pred_w"] + p["pred_b"]
    return jax.nn.log_softmax(logits, axis=1), feats


def cls_collect_forward(params, x, K, n_cls):
    """[B, 1+K, C] log-softmax predictions (dummy first)."""
    B, H, W_, _ = x.shape
    Cc = cls_cat(K - 1)
    bufs = [jnp.zeros((B, H, W_, Cc)),
            jnp.zeros((B, H, W_, Cc)),
            jnp.zeros((B, H // 2, W_ // 2, 2 * Cc)),
            jnp.zeros((B, H // 4, W_ // 4, 4 * Cc)),
            jnp.zeros((B, 8 * Cc))]
    d = params["dummy"]["cls"]
    dummy_pred, _ = _cls_forward_slot(d, 0, x, bufs, n_cls)
    preds = [dummy_pred]
    for s in range(K):
        pred, feats = _cls_forward_slot(_slot(params["cls"], s), s, x, bufs, n_cls)
        preds.append(pred)
        bufs = [jax.lax.stop_gradient(f) for f in feats]
    return jnp.stack(preds, axis=1)


def cls_collect_nll(params, x, y, K, n_cls, chill):
    """Chilled NLL per slot (reference classifier.py:22-35: value with chill,
    gradient without)."""
    preds = cls_collect_forward(params, x, K, n_cls)  # [B, 1+K, C]
    nll = -jnp.take_along_axis(preds, y[:, None, None].repeat(preds.shape[1], 1),
                               axis=2)[:, :, 0]
    chilled = jax.nn.log_softmax(preds / chill, axis=2)
    nll_ch = -jnp.take_along_axis(chilled, y[:, None, None].repeat(
        preds.shape[1], 1), axis=2)[:, :, 0]
    return nll - jax.lax.stop_gradient(nll) + jax.lax.stop_gradient(nll_ch)


# ---------------------------------------------------------------- top level

def collect_nll(params, x, y, rng, params_ns):
    K = int(params_ns.max_experts)
    n_cls = n_classes_match[params_ns.data]
    g = vae_collect_nll(params, x, rng, K)
    d = cls_collect_nll(params, x, y, K, n_cls, params_ns.classifier_chill)
    return g + d


def ndpm_predict(params, x, rng, log_counts, active, params_ns):
    """log joint over classes (reference ndpm.py:24-41)."""
    K = int(params_ns.max_experts)
    n_cls = n_classes_match[params_ns.data]
    slot_active = jnp.arange(K) < active  # real experts
    log_evid = -vae_collect_nll(params, x, rng, K)[:, 1:]        # [B, K]
    log_prior = jnp.where(slot_active, log_counts[1:], -jnp.inf)  # [K]
    log_prior = log_prior - jax.nn.logsumexp(log_prior)
    log_joint = (log_prior[None, :, None] + log_evid[:, :, None] +
                 cls_collect_forward(params, x, K, n_cls)[:, 1:, :])
    log_joint = jnp.where(slot_active[None, :, None], log_joint, -jnp.inf)
    return jax.nn.logsumexp(log_joint, axis=1)  # [B, C]


def build_ndpm(params_ns):
    """Sentinel for setup_architecture: the CNDPM agent manages its own
    parameter pytrees and apply functions (this module's free functions)."""
    return ("ndpm", params_ns.max_experts)
