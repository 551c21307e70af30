"""multiple_run_parallel: R vmapped runs produce valid metrics and match the
sequential runner's semantics (same metric shapes, sane accuracy)."""

import numpy as np

from ocl_tpu.config import default_params
from ocl_tpu.experiment.parallel_run import multiple_run_parallel


def test_parallel_runs_end_to_end():
    p = default_params(data="synthetic", agent="ER", num_runs=3, num_tasks=2,
                       mem_size=80, synthetic_size=30, nf=4, test_batch=32,
                       verbose=False, parallel_runs=True)
    (aea, ci), (aef, _), _, _, _ = multiple_run_parallel(p)
    assert 0 <= aea <= 1
    assert np.isfinite(ci)  # real CI from 3 runs in one launch
    assert aef >= 0


def test_parallel_falls_back_for_ncm_agents():
    p = default_params(data="synthetic", agent="ER", ncm_trick=True, num_runs=1,
                       num_tasks=2, mem_size=60, synthetic_size=30, nf=4,
                       test_batch=32, verbose=False)
    res = multiple_run_parallel(p)  # sequential fallback (NCM eval)
    assert np.isfinite(res[0][0])
