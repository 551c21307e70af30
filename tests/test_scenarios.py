"""Scenario coverage: NI streams, offline mode, mem_iters, sharded eval,
store path, pretrained surface."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ocl_tpu.config import default_params
from ocl_tpu.data import prepare_test_loaders
from ocl_tpu.data.non_stationary import apply_blur, apply_noise, apply_occlusion
from ocl_tpu.experiment.run import multiple_run
from ocl_tpu.registry import agents


def test_ni_generators_shapes_and_range():
    g = np.random.RandomState(0)
    x = g.rand(4, 16, 16, 3)
    for fn, fac in ((apply_noise, 0.8), (apply_blur, 1.2), (apply_occlusion, 0.4)):
        out = fn(x, fac)
        assert out.shape == x.shape
        assert out.min() >= 0 and out.max() <= 1
    # blur preserves the mean roughly; occlusion paints a square of ones
    occ = apply_occlusion(np.zeros((2, 16, 16, 3)), 0.5)
    assert occ.max() == 1.0 and occ.sum() > 0


def test_ni_scenario_end_to_end():
    p = default_params(data="synthetic", cl_type="ni", ns_type="noise",
                       ns_factor=[0.0, 0.6], synthetic_size=40, nf=4,
                       mem_size=60, test_batch=32, verbose=False, val_size=0.1)
    res = multiple_run(p)
    assert np.isfinite(res[0][0])


def test_offline_mode():
    p = default_params(data="synthetic", online=False, num_tasks=2,
                       synthetic_size=30, nf=4, mem_size=60, test_batch=32,
                       verbose=False)
    avg = multiple_run(p)
    assert 0 <= avg <= 1


def test_mem_iters_unroll():
    p = default_params(data="synthetic", mem_iters=2, synthetic_size=30, nf=4,
                       mem_size=60, test_batch=32, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    state = agent.train_learner(state, g.rand(30, 32, 32, 3).astype(np.float32),
                                g.randint(0, 2, 30))
    assert int(state.buffer.current_index) == 30


def test_store_pickle(tmp_path, monkeypatch):
    monkeypatch.chdir("/root/repo")
    p = default_params(data="synthetic", num_tasks=2, synthetic_size=30, nf=4,
                       mem_size=60, test_batch=32, verbose=False,
                       model_name="ERT", data_name="syn")
    multiple_run(p, store=True, save_path="t.pkl")
    with open("result/synthetic/t.pkl", "rb") as f:
        result = pickle.load(f)
    assert result["acc_array"].shape == (1, 2, 2)
    os.remove("result/synthetic/t.pkl")


def test_sharded_eval_8dev():
    from ocl_tpu.parallel.dp import make_dp_eval
    from ocl_tpu.parallel.mesh import get_mesh

    p = default_params(data="synthetic", nf=4, test_batch=16, verbose=False)
    agent = agents["ER"](p)
    state = agent.init_state(jax.random.PRNGKey(0))
    g = np.random.RandomState(0)
    loaders = prepare_test_loaders([(g.rand(64, 32, 32, 3).astype(np.float32),
                                     g.randint(0, 10, 64))], p)
    mesh = get_mesh(8)
    fn = make_dp_eval(agent, mesh)
    with mesh:
        correct = fn(state.params, state.batch_stats, *loaders[0])
    assert 0 <= int(correct) <= 64


def test_pretrained_surface(tmp_path):
    from ocl_tpu.models.pretrained import ResNet18_pretrained

    module, params, stats = ResNet18_pretrained(7, input_size=32)
    out = module.apply({"params": params, "batch_stats": stats},
                       jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 7)
    # weight loading from an npz roundtrip
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    key0 = "/".join(str(getattr(q, "key", q)) for q in leaves[0][0])
    np.savez(tmp_path / "w.npz", **{key0: np.ones_like(np.asarray(leaves[0][1]))})
    _, params2, _ = ResNet18_pretrained(7, weights_npz=str(tmp_path / "w.npz"),
                                        input_size=32)
    leaf2 = jax.tree_util.tree_flatten_with_path(params2)[0][0][1]
    np.testing.assert_allclose(np.asarray(leaf2), 1.0)


def test_profiling_utils(tmp_path):
    import jax.numpy as jnp

    from ocl_tpu.utils.profiling import Throughput, trace

    tput = Throughput()
    with tput.measure(100, sync=jnp.ones(4)):
        pass
    assert tput.images_per_sec() > 0
    with trace(str(tmp_path / "tr")) as d:
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert os.path.isdir(d)
