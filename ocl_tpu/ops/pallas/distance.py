"""Pairwise squared-euclidean distance as a fused Pallas TPU kernel.

The KNN-SV kernel (reference utils/buffer/aser_utils.py:94-116) and NCM
evaluation both reduce to an (N, M) distance matrix over deep features. The
naive broadcast form materializes an [N, M, D] intermediate in HBM; this
kernel computes ||a||^2 + ||b||^2 - 2 a.b^T in one VMEM-resident pass, riding
the MXU for the cross term. Shapes here are small (hundreds x hundreds x
feature dim), so a single grid step with padded tiles suffices.

Falls back to the same fused jnp expression off-TPU (tests run the Pallas
path in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    a2 = jnp.sum(a * a, axis=1, keepdims=True)            # [N, 1]
    b2 = jnp.sum(b * b, axis=1, keepdims=True)            # [M, 1]
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    out_ref[:] = a2 + b2.T - 2.0 * cross


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pairwise_sqdist_pallas(a, b, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = a.shape
    m = b.shape[0]
    np_, mp_, dp_ = _round_up(n, 8), _round_up(m, 128), _round_up(d, 128)
    a_pad = jnp.zeros((np_, dp_), jnp.float32).at[:n, :d].set(a)
    b_pad = jnp.zeros((mp_, dp_), jnp.float32).at[:m, :d].set(b)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_pad, b_pad)
    return out[:n, :m]


def _pairwise_sqdist_jnp(a, b):
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    return a2 + b2.T - 2.0 * (a @ b.T)


def pairwise_sqdist(a, b, force_pallas: bool | None = None):
    """[N, M] squared distances; Pallas on TPU, fused jnp elsewhere."""
    if force_pallas is True:
        return _pairwise_sqdist_pallas(a, b, interpret=True)
    if force_pallas is None:
        try:
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
        except Exception:
            on_tpu = False
        if on_tpu:
            return _pairwise_sqdist_pallas(a, b)
    return _pairwise_sqdist_jnp(a, b)
