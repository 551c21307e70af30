"""multiple_run_tune: the CSV-table tuning runner (reference run.py:92-176).

main_tune.py drives multiple_run_tune_separate (covered via the CLI); this
covers the CSV variant end-to-end on a tiny synthetic stream: grid search on
the first num_val batches, training on the rest, per-run CSV rows + final
summary row.
"""

import os
import tempfile

import numpy as np
import pytest


def test_multiple_run_tune_writes_csv():
    pd = pytest.importorskip("pandas")

    from ocl_tpu.config import default_params
    from ocl_tpu.experiment.tune import multiple_run_tune

    p = default_params(data="synthetic", agent="ER", mem_size=100, batch=10,
                       eps_mem_batch=10, nf=4, verbose=False, num_runs=1,
                       num_val=1, num_runs_val=1, num_tasks=3,
                       synthetic_size=30, test_batch=20)
    tune_params = {"learning_rate": [0.05, 0.1]}

    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "config"))
        with open(os.path.join(d, "config", "global.yml"), "w") as f:
            f.write("path:\n  tables: tables/\n  result: result/\n")
        os.chdir(d)
        try:
            avg_end_acc = multiple_run_tune(p, tune_params, "out.csv")
            table = os.path.join("tables", p.data, "out.csv")
            assert os.path.exists(table)
            df = pd.read_csv(table)
            # one row per run + the final summary row
            assert len(df) == p.num_runs + 1
            assert "Avg_End_Acc" in df.columns
            assert str(df.iloc[-1]["Run"]) == "Final Result"
            assert np.isfinite(float(np.asarray(avg_end_acc)[0]))
        finally:
            os.chdir(cwd)
