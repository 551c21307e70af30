"""Numerical parity vs torch: same weights -> same forward, BN stats, SGD step.

The accuracy target is +-1pt of the torch reference (BASELINE.md); with no
dataset on disk the strongest available check is operator-level: copy weights
from an architecture-equivalent torch Reduced ResNet-18 (see
tools/measure_torch_baseline.py) into the flax model and require matching
eval logits, train-mode logits, BN running-stat updates, and one SGD step.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")

from measure_torch_baseline import ReducedResNet18 as TorchNet  # noqa: E402

from ocl_tpu.models import forward_eval, forward_train, init_model  # noqa: E402
from ocl_tpu.models.resnet import Reduced_ResNet18  # noqa: E402


def _copy_weights(tnet, params, stats):
    """torch state -> (params, batch_stats) pytrees."""
    params = jax.tree_util.tree_map(np.asarray, params)
    stats = jax.tree_util.tree_map(np.asarray, stats)

    def conv(w):
        return np.transpose(w.detach().numpy(), (2, 3, 1, 0))

    params["conv1"]["Conv_0"]["kernel"] = conv(tnet.conv1.weight)
    params["bn1"]["scale"] = tnet.bn1.weight.detach().numpy()
    params["bn1"]["bias"] = tnet.bn1.bias.detach().numpy()
    stats["bn1"]["mean"] = tnet.bn1.running_mean.numpy()
    stats["bn1"]["var"] = tnet.bn1.running_var.numpy()
    for s in range(4):
        for b in range(2):
            blk = tnet.trunk[2 * s + b]
            key = f"stages_{s}_{b}"
            params[key]["Conv3x3_0"]["Conv_0"]["kernel"] = conv(blk.c1.weight)
            params[key]["Conv3x3_1"]["Conv_0"]["kernel"] = conv(blk.c2.weight)
            for i, bn in ((0, blk.b1), (1, blk.b2)):
                params[key][f"BatchNorm_{i}"]["scale"] = bn.weight.detach().numpy()
                params[key][f"BatchNorm_{i}"]["bias"] = bn.bias.detach().numpy()
                stats[key][f"BatchNorm_{i}"]["mean"] = bn.running_mean.numpy()
                stats[key][f"BatchNorm_{i}"]["var"] = bn.running_var.numpy()
            if blk.short is not None:
                params[key]["Conv1x1_0"]["Conv_0"]["kernel"] = conv(blk.short[0].weight)
                params[key]["BatchNorm_2"]["scale"] = blk.short[1].weight.detach().numpy()
                params[key]["BatchNorm_2"]["bias"] = blk.short[1].bias.detach().numpy()
                stats[key]["BatchNorm_2"]["mean"] = blk.short[1].running_mean.numpy()
                stats[key]["BatchNorm_2"]["var"] = blk.short[1].running_var.numpy()
    params["linear"]["Dense_0"]["kernel"] = tnet.linear.weight.detach().numpy().T
    params["linear"]["Dense_0"]["bias"] = tnet.linear.bias.detach().numpy()
    # jnp.array (not asarray): on the CPU backend asarray is zero-copy, and
    # tensor.numpy() aliases torch storage — a later torch train-mode forward
    # would silently rewrite the "jax" running stats in place.
    to_j = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.array(a, copy=True), t)
    return to_j(params), to_j(stats)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tnet = TorchNet(n_classes=10, nf=20)
    module = Reduced_ResNet18(10)
    params, stats = init_model(module, jax.random.PRNGKey(0), "cifar10")
    params, stats = _copy_weights(tnet, params, stats)
    g = np.random.RandomState(0)
    x = g.rand(10, 32, 32, 3).astype(np.float32)
    y = g.randint(0, 10, 10)
    return tnet, module, params, stats, x, y


def test_eval_forward_matches(models):
    tnet, module, params, stats, x, y = models
    tnet.eval()
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(forward_eval(module, params, stats, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_train_forward_and_bn_stats_match(models):
    tnet, module, params, stats, x, y = models
    tnet.train()
    want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    got, new_stats = forward_train(module, params, stats, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    # running stats after one train-mode forward
    np.testing.assert_allclose(np.asarray(new_stats["bn1"]["mean"]),
                               tnet.bn1.running_mean.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["bn1"]["var"]),
                               tnet.bn1.running_var.numpy(), rtol=1e-3, atol=1e-5)
    blk = tnet.trunk[7]
    np.testing.assert_allclose(
        np.asarray(new_stats["stages_3_1"]["BatchNorm_1"]["mean"]),
        blk.b2.running_mean.numpy(), rtol=1e-3, atol=1e-5)


def test_sgd_step_matches(models):
    import optax

    from ocl_tpu.ops.losses import cross_entropy
    from ocl_tpu.optim import setup_opt

    tnet, module, params, stats, x, y = models
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ty = torch.from_numpy(y)
    tnet.train()
    opt = torch.optim.SGD(tnet.parameters(), lr=0.1)
    opt.zero_grad()
    torch.nn.functional.cross_entropy(tnet(tx), ty).backward()
    opt.step()

    jtx = setup_opt("SGD", 0.1)
    opt_state = jtx.init(params)

    def loss_fn(p, st):
        logits, new_st = forward_train(module, p, st, jnp.asarray(x))
        return cross_entropy(logits, jnp.asarray(y)), new_st

    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
    updates, _ = jtx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(new_params["linear"]["Dense_0"]["kernel"]),
        tnet.linear.weight.detach().numpy().T, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_params["conv1"]["Conv_0"]["kernel"]),
        np.transpose(tnet.conv1.weight.detach().numpy(), (2, 3, 1, 0)),
        rtol=1e-3, atol=1e-4)


def test_teacher_forward_matches_train_mode_torch(models):
    """forward_teacher == a torch teacher deepcopied in TRAIN mode
    (reference kd_manager.py:22-25: the teacher normalizes by the current
    batch's BN statistics, not running stats). Runs last: re-syncs pytrees
    from the torch net's current (mutated) state first."""
    import copy

    from ocl_tpu.models import forward_teacher

    tnet, module, params, stats, x, y = models
    params, stats = _copy_weights(tnet, params, stats)

    teacher = copy.deepcopy(tnet)
    teacher.train()  # the reference never switches its teacher to eval
    with torch.no_grad():
        want = teacher(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(forward_teacher(module, params, stats, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # output must NOT equal the eval-mode (running-stats) forward
    teacher.eval()
    with torch.no_grad():
        eval_out = teacher(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert np.abs(want - eval_out).max() > 1e-3
