"""ResNet backbone family for online continual learning.

Behavioural parity targets (reference: models/resnet.py:10-168):
  * Reduced_ResNet18: BasicBlock [2,2,2,2], nf=20, bias'd linear head;
    feature dims 160 (32x32), 640 (84x84), 2560 (128x128).
  * features/logits/forward split is load-bearing: NCM eval and the ASER
    KNN-SV kernel consume `features`.
  * SupConResNet: the same trunk + linear/mlp projection head, L2-normalized
    128-d output (reference: models/resnet.py:140-168).

Layout is NHWC and the full train step is jitted; nothing here is a port of
torch module mechanics.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ocl_tpu.models.layers import BatchNorm, Conv1x1, Conv3x3, TorchLinear, avg_pool


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1
    conv_impl: str = "lax"

    @nn.compact
    def __call__(self, x, train: bool, w=None):
        out = Conv3x3(self.planes, self.stride, impl=self.conv_impl)(x)
        out = nn.relu(BatchNorm()(out, train, w))
        out = Conv3x3(self.planes, impl=self.conv_impl)(out)
        out = BatchNorm()(out, train, w)
        if self.stride != 1 or x.shape[-1] != self.expansion * self.planes:
            x = Conv1x1(self.expansion * self.planes, self.stride,
                        impl=self.conv_impl)(x)
            x = BatchNorm()(x, train, w)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    conv_impl: str = "lax"

    @nn.compact
    def __call__(self, x, train: bool, w=None):
        impl = self.conv_impl
        out = nn.relu(BatchNorm()(Conv1x1(self.planes, impl=impl)(x), train, w))
        out = nn.relu(BatchNorm()(
            Conv3x3(self.planes, self.stride, impl=impl)(out), train, w))
        out = BatchNorm()(
            Conv1x1(self.expansion * self.planes, impl=impl)(out), train, w)
        if self.stride != 1 or x.shape[-1] != self.expansion * self.planes:
            x = Conv1x1(self.expansion * self.planes, self.stride, impl=impl)(x)
            x = BatchNorm()(x, train, w)
        return nn.relu(out + x)


_BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck}


class ResNet(nn.Module):
    """GEM/MIR-style ResNet trunk + linear head (reference: models/resnet.py:71-109)."""

    num_blocks: Sequence[int]
    num_classes: int
    nf: int = 20
    block: str = "basic"
    bias: bool = True
    pool_window: int = 4
    # compute policy consumed by models.forward_* at the apply boundary:
    # "bf16" casts params+inputs to bfloat16 for the fwd/bwd (MXU-native;
    # BN statistics stay f32, see layers.BatchNorm), "fp32" is exact.
    compute_dtype: str = "fp32"
    # conv lowering: "lax" (XLA convolutions) or "patch" (im2col matmuls —
    # used by the GSS gradient bank, layers.PatchConv). Identical param tree,
    # so module.clone(conv_impl=...) reuses the same weights.
    conv_impl: str = "lax"

    def setup(self):
        block_cls = _BLOCKS[self.block]
        layers = []
        for stage, (n, stride) in enumerate(zip(self.num_blocks, (1, 2, 2, 2))):
            planes = self.nf * (2 ** stage)
            layers.append([block_cls(planes, stride if i == 0 else 1,
                                     conv_impl=self.conv_impl)
                           for i in range(n)])
        self.conv1 = Conv3x3(self.nf, impl=self.conv_impl)
        self.bn1 = BatchNorm()
        self.stages = layers
        self.linear = TorchLinear(self.num_classes, use_bias=self.bias)

    def features(self, x, train: bool = False, w=None):
        out = nn.relu(self.bn1(self.conv1(x), train, w))
        for stage in self.stages:
            for blk in stage:
                out = blk(out, train, w)
        out = avg_pool(out, self.pool_window)
        return out.reshape(out.shape[0], -1)

    def logits(self, feats):
        return self.linear(feats)

    def __call__(self, x, train: bool = False, w=None):
        return self.logits(self.features(x, train, w))


def Reduced_ResNet18(nclasses, nf=20, bias=True, compute_dtype="fp32"):
    return ResNet([2, 2, 2, 2], nclasses, nf, "basic", bias,
                  compute_dtype=compute_dtype)


def ResNet18(nclasses, nf=64, bias=True):
    return ResNet([2, 2, 2, 2], nclasses, nf, "basic", bias)


def ResNet34(nclasses, nf=64, bias=True):
    return ResNet([3, 4, 6, 3], nclasses, nf, "basic", bias)


def ResNet50(nclasses, nf=64, bias=True):
    return ResNet([3, 4, 6, 3], nclasses, nf, "bottleneck", bias)


def ResNet101(nclasses, nf=64, bias=True):
    return ResNet([3, 4, 23, 3], nclasses, nf, "bottleneck", bias)


def ResNet152(nclasses, nf=64, bias=True):
    return ResNet([3, 8, 36, 3], nclasses, nf, "bottleneck", bias)


class SupConResNet(nn.Module):
    """Reduced ResNet-18 encoder + projection head, L2-normalized embedding."""

    dim_in: int = 160
    head: str = "mlp"
    feat_dim: int = 128
    nf: int = 20
    compute_dtype: str = "fp32"

    def setup(self):
        self.encoder = Reduced_ResNet18(100, nf=self.nf,
                                        compute_dtype=self.compute_dtype)
        if self.head == "linear":
            self.head_layers = [TorchLinear(self.feat_dim)]
        elif self.head == "mlp":
            self.head_layers = [TorchLinear(self.dim_in), TorchLinear(self.feat_dim)]
        elif self.head == "None":
            self.head_layers = []
        else:
            raise NotImplementedError(f"head not supported: {self.head}")

    def features(self, x, train: bool = False, w=None):
        return self.encoder.features(x, train, w)

    def __call__(self, x, train: bool = False, w=None):
        feat = self.encoder.features(x, train, w)
        if self.head == "mlp":
            feat = self.head_layers[1](nn.relu(self.head_layers[0](feat)))
        elif self.head == "linear":
            feat = self.head_layers[0](feat)
        norm = jnp.linalg.norm(feat, axis=1, keepdims=True)
        return feat / jnp.maximum(norm, 1e-12)
