"""Shared layers: torch-semantics BatchNorm and torch-style initializers.

The reference backbone (reference: models/resnet.py) relies on PyTorch's
BatchNorm2d and default Conv2d/Linear inits. Online CL trains at batch size 10
with BN statistics folded in continuously, so matching those semantics matters
for the accuracy-parity target. Everything here is plain flax.linen over NHWC
(TPU-native layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in))
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Linear bias default: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class BatchNorm(nn.Module):
    """BatchNorm with PyTorch BatchNorm2d semantics.

    Differences from flax.linen.BatchNorm that matter here:
      * running_var is updated with the *unbiased* batch variance while
        normalization uses the biased one (torch behaviour; at batch size 10
        the n/(n-1) factor is a 11% difference in the running stats).
      * momentum convention: new = (1 - m) * old + m * batch, with m = 0.1.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, w=None):
        """`w` [B] optionally masks/weights rows out of the batch statistics
        (fixed-shape batches with validity masks stand in for the reference's
        dynamically-sized memory batches)."""
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features, jnp.float32))

        # statistics always reduce in f32 (a no-op for f32 inputs; under the
        # bf16 compute policy only the convs run low-precision — means and
        # variances of bf16 activations would otherwise lose BN fidelity)
        xf = x.astype(jnp.float32)
        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            if w is None:
                n = jnp.asarray(x.size // features, jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)  # biased
            else:
                spatial = x.size // features // x.shape[0]
                wf = w.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                n = jnp.maximum(jnp.sum(wf) * spatial, 1.0)
                mean = jnp.sum(xf * wf, axis=reduce_axes) / n
                var = jnp.sum(jnp.square(xf - mean) * wf, axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        out = (xf - mean) * inv + bias.astype(jnp.float32)
        return out.astype(x.dtype)


class PatchConv(nn.Module):
    """Conv expressed as im2col patches @ matrix — param-compatible with
    nn.Conv (one 'kernel' leaf, HWIO).

    Built as the candidate lowering for the GSS gradient bank: under
    `vmap(jax.grad)` with SHARED weights XLA lowers nn.Conv's per-lane
    weight-grads to grouped convolutions (~3.9x over their compute bound —
    docs/PERFORMANCE.md); with the conv written as patches @ W the same
    weight-grad is patchesᵀ @ cotangent, one batched MXU matmul per layer.
    MEASURED OUTCOME (tools/probe_gss_im2col.py, v5e): the im2col bank runs
    8.09 vs 4.39 ms — at nf=20 the matmuls are too narrow (K ≤ 180,
    N ≤ 160) to fill the MXU better than the grouped convs, so
    buffer/gss.py keeps the lax lowering. PatchConv stays as a tested
    alternative lowering (conv_impl='patch' on the ResNet family; forward
    and grads match nn.Conv to reduction-order tolerance,
    tests/test_model.py::test_patch_conv_matches_lax_conv).

    conv_general_dilated_patches orders the patch axis (C, kh, kw) — the
    kernel reshape below must match (verified against conv_general_dilated).
    """

    features: int
    kernel_size: tuple = (3, 3)
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (kh, kw, cin, self.features))
        kernel = kernel.astype(x.dtype)
        if (kh, kw) == (1, 1):
            w = kernel.reshape(cin, self.features)
            if self.stride != 1:
                x = x[:, ::self.stride, ::self.stride, :]
            return x @ w
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        w = kernel.transpose(2, 0, 1, 3).reshape(cin * kh * kw, self.features)
        return patches @ w


class Conv3x3(nn.Module):
    features: int
    stride: int = 1
    # 'lax': nn.Conv (XLA convolution — the default fwd/bwd path);
    # 'patch': im2col matmul lowering (see PatchConv). Same param tree.
    impl: str = "lax"

    @nn.compact
    def __call__(self, x):
        if self.impl == "patch":
            return PatchConv(self.features, (3, 3), self.stride, 1,
                             name="Conv_0")(x)
        return nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                       padding=1, use_bias=False, kernel_init=torch_kernel_init,
                       name="Conv_0")(x)


class Conv1x1(nn.Module):
    features: int
    stride: int = 1
    impl: str = "lax"

    @nn.compact
    def __call__(self, x):
        if self.impl == "patch":
            return PatchConv(self.features, (1, 1), self.stride, 0,
                             name="Conv_0")(x)
        return nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                       padding=0, use_bias=False, kernel_init=torch_kernel_init,
                       name="Conv_0")(x)


class TorchLinear(nn.Module):
    """nn.Linear with torch default init (incl. its bias distribution)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(fan_in))(x)


def avg_pool(x, window: int):
    """torch avg_pool2d(x, k): kernel k, stride k, floor-mode (drops remainder)."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = (h // window) * window, (w // window) * window
    x = x[..., :th, :tw, :]
    return nn.avg_pool(x, (window, window), strides=(window, window))
