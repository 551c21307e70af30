"""Unit tests for the parity harness's statistics (tools/parity_vs_reference).

No model training: exercises the seed-paired delta/CI math, the
peak-vs-end decomposition identity (Δfgt = Δpeak − Δacc), the ±1 pt band
verdict, and the ref-side cache-key invariance to ocl-only config keys.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import parity_vs_reference as pv  # noqa: E402


def _mats(rng, n, T=4):
    return [rng.rand(T, T) for _ in range(n)]


def test_paired_stats_identities():
    rng = np.random.RandomState(0)
    ref, ocl = _mats(rng, 6), _mats(rng, 6)
    row = pv.paired_stats(ref, ocl)
    assert row["seeds"] == 6
    # decomposition identity: fgt = peak - end per seed, hence in the means
    assert abs(row["d_fgt"] - (row["d_peak"] - row["d_acc"])) < 1e-12
    # means match direct computation
    d_acc = np.mean([o[-1].mean() - r[-1].mean() for r, o in zip(ref, ocl)])
    assert abs(row["d_acc"] - d_acc) < 1e-12
    # CI: scipy t-interval over the per-seed deltas
    from scipy import stats as sps

    deltas = [o[-1].mean() - r[-1].mean() for r, o in zip(ref, ocl)]
    ci = sps.t.ppf(0.975, 5) * sps.sem(deltas)
    assert abs(row["d_acc_ci95"] - ci) < 1e-12
    assert len(row["per_seed_d_acc"]) == 6


def test_paired_stats_single_seed_nan_ci():
    rng = np.random.RandomState(1)
    row = pv.paired_stats(_mats(rng, 1), _mats(rng, 1))
    assert np.isnan(row["d_acc_ci95"])
    assert pv._band_verdict("ER", row) == "n=1"


def test_band_verdict():
    def row(m, h, arith=None):
        r = {"d_acc": m, "d_acc_ci95": h}
        if arith:
            r["arith"] = arith
        return r

    assert pv._band_verdict("ER", row(0.005, 0.002)) == "pass"
    assert pv._band_verdict("ER", row(-0.009, 0.5)) == "pass"
    # CI reaches 0.005
    assert pv._band_verdict("ER", row(0.03, 0.025)) == "pass (CI)"
    assert pv._band_verdict("ER", row(0.08, 0.02)) == "FAIL"
    # arithmetic policy: a cpu_f32 companion DEFINES the verdict (r3 #1)
    exact = {"cpu_f32": {"d_acc": -0.002, "d_acc_ci95": 0.014}}
    assert pv._band_verdict("ER", row(0.08, 0.02, exact)) == "pass @exact"
    # a fast-path row is judged on its own column, labelled
    assert pv._band_verdict("ER_BF16", row(0.023, 0.035)) == \
        "pass (CI) (fast-path)"


def test_ref_cache_key_ignores_ocl_only_keys():
    class A:
        per_class, difficulty, num_tasks = 100, 0.85, 5
        mem_size, eps_mem_batch, lr, batch, nf = 500, 10, 0.1, 10, 20

    a = A()
    base = dict(agent="ER", update="random", retrieve="random")
    k_plain = pv._cache_key("ref", dict(base, fused_replay=False), 0, a)
    k_fused = pv._cache_key("ref", dict(base, fused_replay=True), 0, a)
    k_bf16 = pv._cache_key("ref", dict(base, compute_dtype="bf16"), 0, a)
    k_abl = pv._cache_key("ref", dict(base, abl_icarl_noexcl=True), 0, a)
    assert k_plain == k_fused == k_bf16 == k_abl
    # but the ocl side distinguishes them
    o_plain = pv._cache_key("ocl", dict(base, fused_replay=False), 0, a)
    o_fused = pv._cache_key("ocl", dict(base, fused_replay=True), 0, a)
    assert o_plain != o_fused
    # and the ref key responds to reference-visible changes
    k_mir = pv._cache_key("ref", dict(base, retrieve="MIR"), 0, a)
    assert k_mir != k_plain
    k_seed = pv._cache_key("ref", dict(base, fused_replay=False), 1, a)
    assert k_seed != k_plain
