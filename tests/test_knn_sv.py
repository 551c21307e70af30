"""KNN-SV kernel vs a NumPy oracle of the reference recursion
(reference utils/buffer/aser_utils.py:7-61)."""

import jax.numpy as jnp
import numpy as np

from ocl_tpu.ops.knn_sv import knn_sv


def np_knn_sv(eval_f, eval_y, cand_f, cand_y, k):
    n_eval, n_cand = len(eval_y), len(cand_y)
    sv = np.zeros((n_eval, n_cand))
    for i in range(n_eval):
        d = ((eval_f[i][None] - cand_f) ** 2).sum(1)
        order = np.argsort(d, kind="stable")
        cl = cand_y[order]
        ind = (cl == eval_y[i]).astype(float)
        # recursion from the KNN-SV paper: s[last] = ind[last]/n; then
        # s[j] = s[j+1] + (ind[j]-ind[j+1])/k * min(k, j+1)/(j+1)
        s = np.zeros(n_cand)
        s[n_cand - 1] = ind[n_cand - 1] / n_cand
        for j in range(n_cand - 2, -1, -1):
            s[j] = s[j + 1] + (ind[j] - ind[j + 1]) / k * min(k, j + 1) / (j + 1)
        sv[i, order] = s
    return sv


def test_knn_sv_matches_oracle():
    g = np.random.RandomState(0)
    eval_f = g.randn(7, 5).astype(np.float32)
    cand_f = g.randn(12, 5).astype(np.float32)
    eval_y = g.randint(0, 3, 7)
    cand_y = g.randint(0, 3, 12)
    want = np_knn_sv(eval_f, eval_y, cand_f, cand_y, k=3)
    got = np.asarray(knn_sv(jnp.asarray(eval_f), jnp.asarray(eval_y),
                            jnp.ones(7, bool), jnp.asarray(cand_f),
                            jnp.asarray(cand_y), jnp.ones(12, bool), 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_knn_sv_masked_equals_smaller():
    """Masked-out candidates/evals reproduce the dynamically-shaped result."""
    g = np.random.RandomState(1)
    eval_f = g.randn(6, 4).astype(np.float32)
    cand_f = g.randn(10, 4).astype(np.float32)
    eval_y = g.randint(0, 2, 6)
    cand_y = g.randint(0, 2, 10)
    small = np.asarray(knn_sv(jnp.asarray(eval_f[:4]), jnp.asarray(eval_y[:4]),
                              jnp.ones(4, bool), jnp.asarray(cand_f[:7]),
                              jnp.asarray(cand_y[:7]), jnp.ones(7, bool), 2))
    e_mask = np.array([1, 1, 1, 1, 0, 0], bool)
    c_mask = np.array([1] * 7 + [0] * 3, bool)
    big = np.asarray(knn_sv(jnp.asarray(eval_f), jnp.asarray(eval_y),
                            jnp.asarray(e_mask), jnp.asarray(cand_f),
                            jnp.asarray(cand_y), jnp.asarray(c_mask), 2))
    np.testing.assert_allclose(big[:4, :7], small, rtol=1e-4, atol=1e-6)
    assert (big[4:] == 0).all()
    # masked candidates carry no SV mass for valid evals either
    np.testing.assert_allclose(big[:4, 7:], 0.0, atol=1e-6)
