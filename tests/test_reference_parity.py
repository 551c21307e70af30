"""CI accuracy-parity pins against the actual PyTorch reference.

Runs the reference's own agent/buffer code (tools/ref_oracle.py) and ocl_tpu
on identical tiny synthetic class-incremental streams at reduced width (nf=4,
the 1-core-CPU budget) and asserts the run-averaged Avg_End_Acc agree. The
full-width, full-agent comparison lives in PARITY_RESULTS.md (produced by
tools/parity_vs_reference.py on the TPU).

Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/agents"),
    reason="reference checkout not available",
)

SEEDS = (1, 2, 3, 4, 5)
NF = 4
STREAM = dict(per_class=60, difficulty=0.7, num_tasks=3)
HP = dict(mem_size=300, eps_mem_batch=10, lr=0.1, batch=10)


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _compare(cfg):
    import parity_vs_reference as pv

    args = _Args(nf=NF, **HP)
    ref_rows, ocl_rows = [], []
    for seed in SEEDS:
        tasks, tests = pv.make_stream(seed, STREAM["per_class"],
                                      STREAM["difficulty"], STREAM["num_tasks"])
        ref_rows.append(pv.run_ref_side(cfg, tasks, tests, seed, args))
        ocl_rows.append(pv.run_ocl_side(cfg, tasks, tests, seed, args))
    ref_acc, _ = pv.summarize(ref_rows)
    ocl_acc, _ = pv.summarize(ocl_rows)
    return ref_acc, ocl_acc


def test_er_parity():
    ref_acc, ocl_acc = _compare(dict(agent="ER", update="random", retrieve="random"))
    assert abs(ref_acc - ocl_acc) < 0.05, (ref_acc, ocl_acc)


def test_ewc_parity():
    ref_acc, ocl_acc = _compare(
        dict(agent="EWC", lambda_=100.0, alpha=0.9, fisher_update_after=50))
    assert abs(ref_acc - ocl_acc) < 0.05, (ref_acc, ocl_acc)


def test_agem_parity():
    ref_acc, ocl_acc = _compare(dict(agent="AGEM", update="random", retrieve="random"))
    assert abs(ref_acc - ocl_acc) < 0.05, (ref_acc, ocl_acc)


def test_gss_parity():
    """Guards the jvp-gated GSS update (buffer/gss.py) against the
    reference's per-sample-backward implementation."""
    ref_acc, ocl_acc = _compare(
        dict(agent="ER", update="GSS", retrieve="random",
             gss_mem_strength=3, gss_batch_size=10, fused_replay=False))
    assert abs(ref_acc - ocl_acc) < 0.05, (ref_acc, ocl_acc)
