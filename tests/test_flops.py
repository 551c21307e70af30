"""utils.flops: jaxpr FLOP counter oracle checks."""

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.utils.flops import estimate_fn_flops


def test_dense_flops_exact():
    w = jnp.zeros((64, 32))
    x = jnp.zeros((8, 64))

    def fn(x, w):
        return x @ w

    assert estimate_fn_flops(fn, x, w) == 2 * 8 * 64 * 32


def test_conv_flops_exact():
    x = jnp.zeros((4, 16, 16, 3))
    k = jnp.zeros((3, 3, 3, 8))

    def fn(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # out 4*16*16*8 elements, 3*3*3 MACs each
    assert estimate_fn_flops(fn, x, k) == 2 * (4 * 16 * 16 * 8) * (3 * 3 * 3)


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16))
    xs = jnp.zeros((10, 4, 16))

    def fn(w, xs):
        def body(c, x):
            return c, x @ w

        return jax.lax.scan(body, None, xs)[1]

    per_step = 2 * 4 * 16 * 16
    got = estimate_fn_flops(fn, w, xs)
    assert got == 10 * per_step, got


def test_grad_counts_more_than_forward():
    w = jnp.zeros((32, 32))
    x = jnp.zeros((8, 32))

    def loss(w):
        return jnp.sum((x @ w) ** 2)

    fwd = estimate_fn_flops(loss, w)
    bwd = estimate_fn_flops(jax.grad(loss), w)
    assert bwd >= 2 * fwd  # fwd + at least one matmul-sized transpose pass


def test_er_step_flops_magnitude():
    """ER scan FLOPs at nf=4 land in the physically-sensible range
    (conv-dominated, > 10 MFLOP/step at the fused 20-row shape)."""
    from ocl_tpu.config import default_params
    from ocl_tpu.registry import agents

    p = default_params(data="synthetic", agent="ER", mem_size=100, batch=10,
                       eps_mem_batch=10, nf=4, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train(list(range(10)))
    fn = agent._build_train_task_fn()
    n = 3
    xs = jnp.zeros((n, 10, 32, 32, 3), jnp.float32)
    ys = jnp.zeros((n, 10), jnp.int32)
    per_step = estimate_fn_flops(fn, state, ctx, xs, ys) / n
    assert per_step > 1e7, per_step
    assert per_step < 1e10, per_step


def test_counts_through_jit():
    w = jnp.zeros((16, 16))
    x = jnp.zeros((4, 16))
    assert estimate_fn_flops(jax.jit(lambda x, w: x @ w), x, w) == 2 * 4 * 16 * 16
