"""Model shape/parity constants (reference models/resnet.py + setup_elements.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.models import init_model, forward_train, forward_eval, features_eval, param_count
from ocl_tpu.models.resnet import Reduced_ResNet18, SupConResNet


def test_reduced_resnet18_feature_dims():
    # feature dims 160 / 640 / 2560 (reference setup_elements.py:59-66)
    for size, dim in ((32, 160), (84, 640), (128, 2560)):
        m = Reduced_ResNet18(10)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
        f = m.apply(v, jnp.zeros((2, size, size, 3)), train=False, method="features")
        assert f.shape == (2, dim)


def test_reduced_resnet18_param_count():
    # torch Reduced_ResNet18(10): 1,094,750 trainable parameters
    # (conv/bn trunk at nf=20 + 160->10 linear head), counted analytically.
    m = Reduced_ResNet18(10)
    params, stats = init_model(m, jax.random.PRNGKey(0), "cifar10")
    assert param_count(params) == 1_094_750


def test_batchnorm_torch_semantics():
    from ocl_tpu.models.layers import BatchNorm

    bn = BatchNorm()
    x = jnp.asarray(np.random.RandomState(0).randn(10, 4, 4, 3), jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, mut = bn.apply(variables, x, train=True, mutable=["batch_stats"])
    # normalization uses biased variance
    mean = np.mean(np.asarray(x), axis=(0, 1, 2))
    var = np.var(np.asarray(x), axis=(0, 1, 2))
    expected = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)
    # running stats use unbiased variance with momentum 0.1
    n = x.shape[0] * x.shape[1] * x.shape[2]
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), 0.1 * mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * var * n / (n - 1), rtol=1e-5)


def test_supcon_resnet_normalized():
    m = SupConResNet(dim_in=160, head="mlp")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    out = m.apply(v, jnp.asarray(np.random.rand(4, 32, 32, 3), jnp.float32), train=False)
    assert out.shape == (4, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5)


def test_train_eval_forward_shapes():
    m = Reduced_ResNet18(10)
    params, stats = init_model(m, jax.random.PRNGKey(0), "cifar10")
    x = jnp.zeros((10, 32, 32, 3))
    logits, new_stats = forward_train(m, params, stats, x)
    assert logits.shape == (10, 10)
    assert features_eval(m, params, stats, x).shape == (10, 160)
    assert forward_eval(m, params, new_stats, x).shape == (10, 10)


def test_masked_bn_equals_smaller_batch():
    """BN batch statistics with masked rows == statistics of the valid rows
    alone (fixed-shape memory batches must not pollute running stats)."""
    m = Reduced_ResNet18(10, nf=4)
    params, stats = init_model(m, jax.random.PRNGKey(0), "cifar10")
    g = np.random.RandomState(0)
    x = jnp.asarray(g.rand(6, 32, 32, 3), jnp.float32)
    mask = jnp.asarray([True, True, True, False, False, False])
    logits_m, stats_m = forward_train(m, params, stats, x, w=mask)
    logits_s, stats_s = forward_train(m, params, stats, x[:3])
    for a, b in zip(jax.tree_util.tree_leaves(stats_m),
                    jax.tree_util.tree_leaves(stats_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
    # valid rows' outputs match too (normalization used the same statistics)
    np.testing.assert_allclose(np.asarray(logits_m[:3]), np.asarray(logits_s),
                               rtol=2e-3, atol=2e-3)


def test_multi_epoch_batchify():
    from ocl_tpu.config import default_params
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", epoch=3, nf=4, mem_size=40, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    x = g.rand(20, 32, 32, 3).astype(np.float32)
    state2, xs, ys = agent.batchify(state, x, g.randint(0, 2, 20))
    assert xs.shape == (6, 10, 32, 32, 3)  # 2 batches x 3 epochs
    # each epoch covers the same 20 samples in a different order
    flat = np.asarray(ys).reshape(3, 20)
    assert (np.sort(flat, axis=1) == np.sort(flat[0])).all()


def test_patch_conv_matches_lax_conv():
    """conv_impl='patch' (im2col matmul lowering, layers.PatchConv — the
    GSS gradient-bank formulation) is a pure re-lowering: same param tree,
    same forward values, same gradients to reduction-order tolerance."""
    import jax
    import jax.numpy as jnp

    from ocl_tpu.models import forward_eval, init_model
    from ocl_tpu.models.resnet import Reduced_ResNet18
    from ocl_tpu.ops.losses import cross_entropy

    m = Reduced_ResNet18(10, nf=4)
    params, stats = init_model(m, jax.random.PRNGKey(0), "cifar10")
    mp = m.clone(conv_impl="patch")
    # identical param tree: clone applies the same weights directly
    g = np.random.RandomState(0)
    x = jnp.asarray(g.rand(6, 32, 32, 3), jnp.float32)
    y = jnp.asarray(g.randint(0, 10, 6), jnp.int32)

    a = jax.jit(lambda p, s, v: forward_eval(m, p, s, v))(params, stats, x)
    b = jax.jit(lambda p, s, v: forward_eval(mp, p, s, v))(params, stats, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)

    def loss(mod):
        def f(p):
            return cross_entropy(forward_eval(mod, p, stats, x), y)
        return f

    ga = jax.jit(jax.grad(loss(m)))(params)
    gb = jax.jit(jax.grad(loss(mp)))(params)
    la = jax.tree_util.tree_leaves(ga)
    lb = jax.tree_util.tree_leaves(gb)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-3, atol=1e-5)
