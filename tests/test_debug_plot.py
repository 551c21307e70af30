"""--debug_nans sanitizer mode and --plot_sample PNG dumps (SURVEY §5.2,
reference non_stationary.py:127-132)."""

import numpy as np
import pytest

from ocl_tpu.config import default_params
from ocl_tpu.registry import agents


def test_debug_nans_raises_on_nan_input():
    params = default_params(
        data="synthetic", agent="ER", mem_size=50, nf=4, batch=5,
        synthetic_size=10, num_tasks=2, debug_nans=True, verbose=False)
    import jax

    agent = agents["ER"](params)
    state = agent.init_state(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).rand(20, 32, 32, 3).astype(np.float32)
    x[3, 0, 0, 0] = np.nan
    y = (np.arange(20) % 2).astype(np.int64)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        agent.train_learner(state, x, y)


def test_matmul_precision_flag_applies():
    """--matmul_precision highest flips JAX's global default precision (the
    exact-parity arithmetic mode, PARITY.md arithmetic ablation)."""
    import jax

    from ocl_tpu.config import apply_runtime_flags

    prev = jax.config.jax_default_matmul_precision
    params = default_params(
        data="synthetic", agent="ER", matmul_precision="highest",
        verbose=False)
    try:
        apply_runtime_flags(params)
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def test_plot_sample_writes_png(tmp_path):
    from ocl_tpu.data.non_stationary import make_ns, plot_ns_samples

    rng = np.random.RandomState(0)
    x8 = rng.randint(0, 256, (12, 16, 16, 3), dtype=np.uint8)
    y = np.zeros(12, np.int64)
    factors = [0.0, 1.5]
    train_set = [make_ns(x8, y, "noise", f) for f in factors]
    paths = plot_ns_samples(train_set, "noise", factors, plot_dir=str(tmp_path))
    assert len(paths) == 2
    from PIL import Image

    img = Image.open(paths[0])
    assert img.size == (10 * 16 + 9 * 2, 16)  # 10-col grid of 16px images


def test_plot_sample_via_dataset(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ocl_tpu.data.continuum import continuum

    params = default_params(
        data="synthetic", cl_type="ni", ns_type="occlusion",
        ns_factor=[0.0, 0.4], synthetic_size=20, num_runs=1,
        plot_sample=True, verbose=False)
    cont = continuum("synthetic", "ni", params)
    cont.new_run()
    import glob

    assert glob.glob(str(tmp_path / "result" / "plots" / "ns_occlusion_*.png"))
