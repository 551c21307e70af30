"""--scan_unroll is semantics-neutral: same trajectories at any factor up
to XLA fusion reassociation (ULP-level float drift).

The TPU default is 4 (throughput); tests elsewhere pin 1 via
OCL_TPU_SCAN_UNROLL for compile speed — this file is the proof that the two
paths compute the same thing, and the only CPU coverage of unroll > 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.config import default_params
from ocl_tpu.registry import agents


def _run(agent_name, unroll, n_steps=6, **kw):
    p = default_params(data="synthetic", agent=agent_name, mem_size=60,
                       batch=10, eps_mem_batch=10, nf=4, verbose=False,
                       scan_unroll=unroll, **kw)
    agent = agents[agent_name](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train(list(range(10)))
    fn = jax.jit(agent._build_train_task_fn(), donate_argnums=0)
    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(n_steps, 10, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 10, (n_steps, 10)), jnp.int32)
    state, m = fn(state, ctx, xs, ys)
    return np.asarray(m["loss"]), np.asarray(
        jax.tree_util.tree_leaves(state.params)[0])


def test_er_unroll_matches():
    l1, p1 = _run("ER", 1)
    l4, p4 = _run("ER", 4)
    np.testing.assert_allclose(l1, l4, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p1, p4, rtol=1e-4, atol=1e-6)


def test_er_unroll_non_divisible_length():
    # n_steps=5 with unroll=4 exercises the remainder path
    l1, p1 = _run("ER", 1, n_steps=5)
    l4, p4 = _run("ER", 4, n_steps=5)
    np.testing.assert_allclose(l1, l4, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p1, p4, rtol=1e-4, atol=1e-6)


def test_mem_iters_two_unrolls_inside_step():
    """--mem_iters 2 (two retrieve+update inner iterations per step,
    reference agents/exp_replay.py:40) runs and learns."""
    l, _ = _run("ER", 1, mem_iters=2)
    assert np.isfinite(l).all()
