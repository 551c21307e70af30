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


# ------------------------------------------------------- _flush merge law

def _row(d_acc, tag=None):
    r = {"d_acc": d_acc, "d_acc_ci95": 0.01, "seeds": 10}
    if tag:
        r["tag"] = tag
    return r


def _flush_args(tmp_path):
    import argparse

    # instance attributes, so _flush's vars(args) round-trips per_class
    return argparse.Namespace(json_out=str(tmp_path / "parity.json"),
                              per_class=100)


def test_flush_startup_floor_resurrects_dropped_rows(tmp_path):
    """A row seen at process startup can never vanish from the written file,
    even if a torn concurrent read (or an intermediate bad state) dropped it
    from disk while this process was computing."""
    import json

    args = _flush_args(tmp_path)
    startup = {"SCR_BF16": _row(0.013, "startup")}
    # disk state at flush time: empty (torn read path returns {})
    with open(args.json_out, "w") as f:
        json.dump({"args": {"per_class": 100}, "results": {}}, f)
    rows = pv._flush(args, {"GSS": _row(-0.01)}, {}, startup_rows=startup)
    assert rows["SCR_BF16"]["tag"] == "startup"   # resurrected
    assert "GSS" in rows
    on_disk = pv._load_rows(args.json_out, 100)
    assert set(on_disk) == {"SCR_BF16", "GSS"}


def test_flush_disk_beats_floor_and_own_beats_disk(tmp_path):
    """Precedence: freshest-on-disk cells override the startup floor; this
    process's own rows override both. Arith companions merge per-cell."""
    import json

    args = _flush_args(tmp_path)
    startup = {
        "ER": _row(0.001, "stale"),
        "ASER": dict(_row(0.002, "stale"),
                     arith={"tpu_highest": {"d_acc": -0.035}}),
    }
    disk = {
        "ER": _row(0.003, "fresh-disk"),          # another job updated ER
        "ASER": dict(_row(0.004, "fresh-disk"),
                     arith={"tpu_highest": {"d_acc": -0.030}}),
    }
    with open(args.json_out, "w") as f:
        json.dump({"args": {"per_class": 100}, "results": disk}, f)
    own_default = {"ER": _row(0.005, "own")}
    own_arith = {"ASER": {"cpu_f32": {"d_acc": 0.005}}}
    rows = pv._flush(args, own_default, own_arith, startup_rows=startup)
    assert rows["ER"]["tag"] == "own"             # own > disk > floor
    assert rows["ASER"]["tag"] == "fresh-disk"    # disk > floor
    # own arith cell merged into the disk row without clobbering its sibling
    assert rows["ASER"]["arith"]["cpu_f32"]["d_acc"] == 0.005
    assert rows["ASER"]["arith"]["tpu_highest"]["d_acc"] == -0.030


def test_flush_preserves_concurrent_rows_without_startup(tmp_path):
    """Re-read-at-flush still holds: rows another process landed after this
    one started are preserved even when no startup snapshot is passed."""
    import json

    args = _flush_args(tmp_path)
    disk = {"MIR": _row(0.006, "concurrent")}
    with open(args.json_out, "w") as f:
        json.dump({"args": {"per_class": 100}, "results": disk}, f)
    rows = pv._flush(args, {"ER": _row(0.005)}, {})
    assert rows["MIR"]["tag"] == "concurrent"
    assert "ER" in rows
