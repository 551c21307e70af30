"""--compute_dtype bf16: the mixed-precision policy (models._policy_in/_out).

Checks the policy is (a) wired end-to-end through an ER task scan, (b) keeps
master params / BN running stats / logits in f32, and (c) stays numerically
close to the f32 path on a short stream (BN stats reduce in f32 by design,
layers.BatchNorm).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.config import default_params
from ocl_tpu.models import forward_train, init_model, setup_architecture
from ocl_tpu.registry import agents


def _run_er(compute_dtype, n_steps=12):
    p = default_params(data="synthetic", agent="ER", mem_size=100, batch=10,
                       eps_mem_batch=10, nf=4, verbose=False,
                       compute_dtype=compute_dtype)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train(list(range(10)))
    fn = jax.jit(agent._build_train_task_fn(), donate_argnums=0)
    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(n_steps, 10, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 10, (n_steps, 10)), jnp.int32)
    state, m = fn(state, ctx, xs, ys)
    return state, np.asarray(m["loss"])


def test_bf16_er_trains_and_keeps_f32_master_state():
    state, losses = _run_er("bf16")
    assert np.isfinite(losses).all()
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_bf16_close_to_f32():
    _, l32 = _run_er("fp32")
    _, l16 = _run_er("bf16")
    # same stream, same init: trajectories diverge only by rounding
    np.testing.assert_allclose(l16, l32, rtol=0.08, atol=0.08)


def test_bf16_forward_logits_are_f32():
    p = default_params(data="synthetic", agent="ER", nf=4,
                       compute_dtype="bf16")
    module = setup_architecture(p)
    params, stats = init_model(module, jax.random.PRNGKey(0), p.data)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    logits, new_stats = forward_train(module, params, stats, x)
    assert logits.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new_stats):
        assert leaf.dtype == jnp.float32
