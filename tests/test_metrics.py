"""compute_performance oracle tests (reference experiment/metrics.py math)."""

import numpy as np
import pytest

from ocl_tpu.experiment.metrics import compute_performance, single_run_avg_end_fgt

pytestmark = pytest.mark.smoke


def test_compute_performance_hand_case():
    # 2 runs, 3 tasks; lower-triangular accuracy matrices
    acc = np.array([
        [[0.9, 0.0, 0.0],
         [0.8, 0.7, 0.0],
         [0.6, 0.5, 0.9]],
        [[0.8, 0.0, 0.0],
         [0.7, 0.6, 0.0],
         [0.5, 0.4, 0.8]],
    ])
    (aea, _), (aef, _), (aa, _), (bwtp, _), (fwt, _) = compute_performance(acc)
    # avg end acc = mean of last row per run
    np.testing.assert_allclose(aea, np.mean([np.mean([.6, .5, .9]), np.mean([.5, .4, .8])]))
    # forgetting: best over time minus end, averaged
    f1 = np.mean([0.9 - 0.6, 0.7 - 0.5, 0.9 - 0.9])
    f2 = np.mean([0.8 - 0.5, 0.6 - 0.4, 0.8 - 0.8])
    np.testing.assert_allclose(aef, np.mean([f1, f2]))
    # avg acc: mean over tasks of running lower-tri means
    a1 = np.mean([0.9, (0.8 + 0.7) / 2, (0.6 + 0.5 + 0.9) / 3])
    a2 = np.mean([0.8, (0.7 + 0.6) / 2, (0.5 + 0.4 + 0.8) / 3])
    np.testing.assert_allclose(aa, np.mean([a1, a2]))
    # BWT+: positive part of mean backward transfer
    b1 = ((0.8 - 0.9) + (0.6 - 0.9) + (0.5 - 0.7)) / 3
    b2 = ((0.7 - 0.8) + (0.5 - 0.8) + (0.4 - 0.6)) / 3
    np.testing.assert_allclose(bwtp, np.mean([max(b1, 0), max(b2, 0)]))
    # FWT: upper-tri sum / pairs (zero here)
    np.testing.assert_allclose(fwt, 0.0)


def test_single_run_avg_end_fgt():
    acc = np.array([[0.9, 0.0], [0.5, 0.8]])
    np.testing.assert_allclose(single_run_avg_end_fgt(acc), np.mean([0.4, 0.0]))
