"""Pallas kernels vs jnp oracles (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from ocl_tpu.ops.pallas.distance import pairwise_sqdist


def test_pairwise_sqdist_pallas_matches_numpy():
    g = np.random.RandomState(0)
    a = g.randn(13, 50).astype(np.float32)
    b = g.randn(37, 50).astype(np.float32)
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b),
                                     force_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got_jnp = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b),
                                         force_pallas=False))
    np.testing.assert_allclose(got_jnp, want, rtol=1e-4, atol=1e-4)
