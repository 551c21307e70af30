"""End-to-end smoke: ER learns a synthetic class-incremental stream.

Counterpart of running reference general_main.py on a small stream; uses a
narrow backbone (nf=4) to keep CPU compile time in CI budget.
"""

import pytest

from ocl_tpu.config import default_params
from ocl_tpu.experiment.run import multiple_run


@pytest.mark.smoke
def test_er_learns_synthetic_stream():
    p = default_params(data="synthetic", num_runs=1, num_tasks=3, mem_size=150,
                       eps_mem_batch=10, synthetic_size=60, verbose=False,
                       test_batch=32, nf=4, fix_order=True)
    (aea, _), (aef, _), _, _, _ = multiple_run(p)
    # replay memory keeps all 3 tasks learnable on this easy stream
    assert aea > 0.8, f"Avg_End_Acc too low: {aea}"
    assert aef < 0.2, f"forgetting too high: {aef}"


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge
    import jax

    fwd, args = ge.entry()
    out = jax.jit(fwd)(*args)
    assert out.shape == (10, 10)
    ge.dryrun_multichip(8)


def test_fused_replay_learns_equivalently():
    """--fused_replay: one fused forward/backward, same learning outcome."""
    p = default_params(data="synthetic", num_runs=1, num_tasks=3, mem_size=150,
                       eps_mem_batch=10, synthetic_size=60, verbose=False,
                       test_batch=32, nf=4, fix_order=True, fused_replay=True)
    (aea, _), (aef, _), _, _, _ = multiple_run(p)
    assert aea > 0.8, f"fused replay Avg_End_Acc too low: {aea}"
    assert aef < 0.2
