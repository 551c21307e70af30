"""Accuracy-parity harness: the actual PyTorch reference vs ocl_tpu.

For each agent configuration, generates identical synthetic class-incremental
streams (per seed), trains BOTH frameworks on them — the reference's own agent
code via tools/ref_oracle.py (torch CPU), and ocl_tpu (TPU or CPU) — and
compares Avg_End_Acc / Avg_End_Fgt computed with the same bit-compatible
metrics (reference: experiment/metrics.py:5-54). Writes PARITY_RESULTS.md.

Statistics (VERDICT r2 #1): runs are seed-paired — both frameworks consume
the same stream per seed — so every row reports the per-seed delta's mean
with a 95% t-interval, plus a peak-vs-end decomposition: Avg_End_Fgt is
per-task peak minus final accuracy (reference experiment/metrics.py:49-54),
so Δfgt = Δpeak − Δacc identically; the decomposition shows whether a
positive Δfgt is peak-height (Δpeak > 0 at Δacc ≥ 0) or retention loss.

Raw accuracy matrices are content-addressed under results/parity_raw/ and
reused across invocations: the torch side (the dominant cost, 1-core CPU) is
computed once per distinct reference-visible config×stream×seed, shared by
ocl-only variant rows (ER/ER_FUSED/ER_BF16; SCR/SCR_FUSED; ICARL and its
ablations) and across re-runs/crashes.

Arithmetic-honest verdicts (VERDICT r3 #1): the torch reference computes
exact-IEEE f32 on CPU, while the ocl side's DEFAULT TPU path rounds f32
convs through truncated-mantissa MXU passes — a measured, benign ±2 pt
noise source at batch 10 (PARITY.md arithmetic ablation). The pass/fail
verdict is therefore DEFINED at reference-exact arithmetic: whenever a row
has an exact-f32 companion run (``--arith cpu_f32``: the ocl side on
XLA:CPU, same IEEE f32 ops as torch), the verdict column judges THAT delta
against the ±1 pt band, and the DEFAULT-precision delta is printed
alongside as the documented fast-path arithmetic cost. Rows whose subject
IS a fast arithmetic mode (ER_BF16) are labelled fast-path and judged on
their own column.

Usage (ocl side on the TPU by default; the torch side is always CPU):
  python tools/parity_vs_reference.py --agents ER MIR EWC --seeds 10
  python tools/parity_vs_reference.py --seeds 10 --ref_only   # warm the
      torch-side cache only (no TPU/JAX use; run in the background)
  JAX_PLATFORMS=cpu python tools/parity_vs_reference.py --agents ER \
      --arith cpu_f32 --seeds 10     # exact-arithmetic companion runs
  python tools/parity_vs_reference.py --import_probe  # fold the committed
      probe summaries (results/er_drift_probe.json) into the report
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RAW_DIR = os.path.join(REPO, "results", "parity_raw")

# Bump when an ocl-side NUMERICS change invalidates cached ocl matrices
# (e.g. the round-5 crop_resize out-of-box-leak fix silently staled every
# SCR-family ocl cache and they had to be hand-deleted). None keeps the
# legacy digests; a string folds into every ocl-side digest so stale
# matrices are orphaned instead of silently reused. Ref-side torch digests
# never carry it (the oracle's numerics are frozen by the reference).
OCL_NUMERICS_VERSION = None

# Agent configurations compared. Keys are report rows; values are param
# overrides shared by both frameworks (flag names are the parity contract).
# Keys in OCL_ONLY_KEYS (and abl_* keys) are invisible to the reference side,
# so rows differing only in those share one cached torch run.
AGENT_CONFIGS = {
    # fused_replay pinned off: the row checks the reference's exact two-pass
    # schedule; ER_FUSED below checks the (default) fused path.
    "ER": dict(agent="ER", update="random", retrieve="random",
               fused_replay=False),
    "MIR": dict(agent="ER", update="random", retrieve="MIR", subsample=50),
    "GSS": dict(agent="ER", update="GSS", retrieve="random",
                gss_mem_strength=10, gss_batch_size=10, fused_replay=False),
    "ASER": dict(agent="ER", update="ASER", retrieve="ASER",
                 aser_type="asvm", k=3, n_smp_cls=2.0),
    "EWC": dict(agent="EWC", lambda_=100.0, alpha=0.9, fisher_update_after=50),
    "AGEM": dict(agent="AGEM", update="random", retrieve="random"),
    "LWF": dict(agent="LWF"),
    "ICARL": dict(agent="ICARL", update="random", retrieve="random"),
    "GDUMB": dict(agent="GDUMB", mem_epoch=10, minlr=0.0005, clip=10.0),
    "SCR": dict(agent="SCR", update="random", retrieve="random",
                head="mlp", temp=0.07, eps_mem_batch=50, fused_replay=False),
    # trick-combination rows (VERDICT r2 #7): the trick flags flow into
    # params.trick on both sides (reference general_main.py:19-21)
    "ER_LABELS": dict(agent="ER", update="random", retrieve="random",
                      fused_replay=False, labels_trick=True),
    "ER_KD": dict(agent="ER", update="random", retrieve="random",
                  fused_replay=False, kd_trick=True),
    # the CVPR SCR recipe (reference config_CVPR/agent/scr/scr_5k.yml):
    # lr 0.1, temp 0.1, eps_mem_batch 100, review_trick
    "SCR_REVIEW": dict(agent="SCR", update="random", retrieve="random",
                       head="mlp", temp=0.1, eps_mem_batch=100,
                       learning_rate=0.1, review_trick=True,
                       fused_replay=False,
                       # explicit (it IS the default) for ocl cache-key
                       # hygiene: pre-dead-forward cached matrices live at
                       # the key without it
                       scr_review_dead_forward=True),
    # review-pass mechanics in isolation (CE loss, no augs/SupCon):
    # localizes SCR_REVIEW's residual between the shared review-pass
    # machinery and the contrastive/augmentation coupling
    "ER_REVIEW": dict(agent="ER", update="random", retrieve="random",
                      fused_replay=False, review_trick=True),
    # ocl-only variant: the (default) fused two-view forward vs the
    # reference's two sequential passes — validates the SCR fusion.
    "SCR_FUSED": dict(agent="SCR", update="random", retrieve="random",
                      head="mlp", temp=0.07, eps_mem_batch=50,
                      fused_replay=True),
    # ocl-only variant vs the plain reference ER: validates that the fused
    # forward/backward (one combined BN statistic fold) stays within the
    # accuracy budget before it is made the default path.
    "ER_FUSED": dict(agent="ER", update="random", retrieve="random",
                     fused_replay=True),
    # ocl-only variant: --compute_dtype bf16 (MXU-native convs) vs the f32
    # torch reference — pins the mixed-precision mode's accuracy budget.
    "ER_BF16": dict(agent="ER", update="random", retrieve="random",
                    compute_dtype="bf16"),
    # SCR under the same fast path (VERDICT r4 #5): shares the cached torch
    # SCR matrices (compute_dtype is OCL_ONLY); pins bf16's accuracy budget
    # on the SupCon two-view/NCM path before the suite's scr_bf16 row can be
    # read as a free speedup.
    "SCR_BF16": dict(agent="SCR", update="random", retrieve="random",
                     head="mlp", temp=0.07, eps_mem_batch=50,
                     fused_replay=False, compute_dtype="bf16"),
    # iCaRL delta ablations (VERDICT r2 weak #6): ocl-only toggles compared
    # against the same cached reference ICARL runs — isolates which
    # implementation choice moves the delta.
    "ICARL_NOEXCL": dict(agent="ICARL", update="random", retrieve="random",
                         abl_icarl_noexcl=True),
    "ICARL_EVALBN": dict(agent="ICARL", update="random", retrieve="random",
                         abl_icarl_teacher_evalbn=True),
    "ICARL_ZEROMEAN": dict(agent="ICARL", update="random", retrieve="random",
                           abl_ncm_zero_empty=True),
    # not in the default sweep (slow); run with --agents CNDPM. Sleep steps
    # are shrunk identically on both sides (see _patch_cndpm_constants).
    "CNDPM": dict(agent="CNDPM", stm_capacity=200, classifier_chill=0.01,
                  log_alpha=-300.0),
}

# param keys that only exist on the ocl side (the reference ignores them);
# stripped before hashing/running the torch side so variant rows share runs
OCL_ONLY_KEYS = {"fused_replay", "compute_dtype", "scr_review_dead_forward"}

DEFAULT_SWEEP = [n for n in AGENT_CONFIGS
                 if n != "CNDPM" and not n.startswith("ICARL_")]

CNDPM_SLEEP_G, CNDPM_SLEEP_D = 500, 200


def _patch_cndpm_constants():
    """Shrink the 4000/1000 sleep steps identically on both frameworks so the
    CN-DPM oracle comparison fits the torch-CPU budget (reference
    global_vars.py:17-18)."""
    from ocl_tpu.models import ndpm_vars as V

    V.SLEEP_STEP_G, V.SLEEP_STEP_D = CNDPM_SLEEP_G, CNDPM_SLEEP_D

    import ref_oracle

    ref_oracle.ensure_reference_importable()
    import models.ndpm.ndpm as rndpm  # star-imported constants live per-module

    rndpm.MODELS_NDPM_NDPM_SLEEP_STEP_G = CNDPM_SLEEP_G
    rndpm.MODELS_NDPM_NDPM_SLEEP_STEP_D = CNDPM_SLEEP_D


def make_stream(seed, per_class, difficulty, num_tasks):
    """One synthetic class-incremental stream both frameworks consume.

    Returns (tasks_float, tests_float) — float32 NHWC in [0,1] whose values
    are exactly uint8/255, so the reference's ToTensor(uint8)/255 path sees
    bit-identical pixels.
    """
    from ocl_tpu.config import default_params
    from ocl_tpu.data.continuum import continuum

    params = default_params(
        data="synthetic", cl_type="nc", num_tasks=num_tasks,
        synthetic_size=per_class, synthetic_difficulty=difficulty,
        num_runs=1, verbose=False)
    np.random.seed(seed)
    cont = continuum("synthetic", "nc", params)
    cont.new_run()
    tasks = [(x, y) for (x, y, _labels) in cont]
    tests = cont.test_data()
    return tasks, tests


def to_uint8(x_float):
    return np.rint(np.asarray(x_float) * 255.0).astype(np.uint8)


# ------------------------------------------------------------- raw-mat cache

def _ref_cfg(cfg):
    return {k: v for k, v in sorted(cfg.items())
            if k not in OCL_ONLY_KEYS and not k.startswith("abl_")}


def _digest(payload) -> str:
    blob = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.md5(blob.encode()).hexdigest()[:12]


def _cache_key(side, cfg, seed, args):
    base = dict(
        stream=dict(per_class=args.per_class, difficulty=args.difficulty,
                    num_tasks=args.num_tasks, stream_seed=seed + 1),
        hp=dict(mem_size=args.mem_size, eps_mem_batch=args.eps_mem_batch,
                lr=args.lr, batch=args.batch, nf=args.nf),
        seed=seed)
    if side == "ref":
        base["cfg"] = _ref_cfg(cfg)
    else:
        base["cfg"] = dict(sorted(cfg.items()))
        if OCL_NUMERICS_VERSION is not None:
            base["ocl_numerics"] = OCL_NUMERICS_VERSION
    if base["cfg"].get("agent") == "CNDPM":
        base["cndpm_sleep"] = [CNDPM_SLEEP_G, CNDPM_SLEEP_D]
    return os.path.join(RAW_DIR, "{}_{}.npy".format(side, _digest(base)))


def _cached(path):
    if os.path.exists(path):
        return np.load(path)
    return None


def _store(path, mat):
    os.makedirs(RAW_DIR, exist_ok=True)
    tmp = path + ".tmp.npy"
    np.save(tmp, mat)
    os.replace(tmp, path)


# ------------------------------------------------------------------ one side

def run_ref_side(cfg, tasks, tests, seed, args):
    import ref_oracle
    from ocl_tpu.config import default_params

    kw = dict(data="cifar10", cl_type="nc", num_tasks=len(tasks),
              verbose=False, num_runs=1, nf=args.nf,
              mem_size=args.mem_size, eps_mem_batch=args.eps_mem_batch,
              learning_rate=args.lr, batch=args.batch)
    kw.update(_ref_cfg(cfg))  # agent config wins on collisions
    params = default_params(**kw)
    tasks8 = [(to_uint8(x), np.asarray(y, np.int64)) for x, y in tasks]
    tests8 = [(to_uint8(x), np.asarray(y, np.int64)) for x, y in tests]
    return ref_oracle.run_reference(params, tasks8, tests8, seed=seed)


def run_ocl_side(cfg, tasks, tests, seed, args):
    import jax

    from ocl_tpu.config import default_params
    from ocl_tpu.data import prepare_test_loaders
    from ocl_tpu.registry import agents

    kw = dict(data="synthetic", cl_type="nc", num_tasks=len(tasks),
              verbose=False, num_runs=1, nf=args.nf,
              mem_size=args.mem_size, eps_mem_batch=args.eps_mem_batch,
              learning_rate=args.lr, batch=args.batch)
    kw.update(cfg)
    params = default_params(**kw)
    agent = agents[params.agent](params)
    state = agent.init_state(jax.random.PRNGKey(seed))
    loaders = prepare_test_loaders(tests, params)
    rows = []
    for x, y in tasks:
        state = agent.train_learner(state, np.asarray(x), np.asarray(y))
        rows.append(np.asarray(agent.evaluate(state, loaders)))
    return np.stack(rows)


def arith_cache_key(arith, cfg, seed, args):
    """Content-addressed path for a non-default-arithmetic ocl matrix.
    Shares the naming scheme (and hence any existing cache) of
    tools/probe_er_drift.py's variant_key."""
    base = os.path.basename(_cache_key("ocl", cfg, seed, args))
    return os.path.join(RAW_DIR, "probe_{}_{}".format(arith, base))


def get_side(side, name, cfg, seed, args, stream_cache, arith="default"):
    """Cached accuracy matrix for one (row, seed, side)."""
    if side == "ocl" and arith != "default":
        path = arith_cache_key(arith, cfg, seed, args)
    else:
        path = _cache_key(side, cfg, seed, args)
    mat = _cached(path)
    if mat is not None:
        return mat, True
    if seed not in stream_cache:
        stream_cache.clear()  # streams are ~50MB; keep one
        stream_cache[seed] = make_stream(seed + 1, args.per_class,
                                         args.difficulty, args.num_tasks)
    tasks, tests = stream_cache[seed]
    t0 = time.time()
    if side == "ref":
        mat = run_ref_side(cfg, tasks, tests, seed, args)
    else:
        mat = run_ocl_side(cfg, tasks, tests, seed, args)
    _store(path, mat)
    print("  [{} {} seed {}] {:.0f}s end_acc {:.3f}".format(
        name, side, seed, time.time() - t0, mat[-1].mean()), flush=True)
    return mat, False


# ------------------------------------------------------------------- stats

def _t_ci95(xs):
    from scipy import stats as sps

    xs = np.asarray(xs, float)
    n = len(xs)
    if n < 2:
        return float(np.mean(xs)), float("nan")
    return float(np.mean(xs)), float(
        sps.t.ppf(0.975, n - 1) * sps.sem(xs))


def summarize(acc_runs):
    """(runs, tasks, tasks) accuracy array -> Avg_End_Acc, Avg_End_Fgt.
    (Kept for tests/test_reference_parity.py.)"""
    from ocl_tpu.experiment.metrics import compute_performance

    arr = np.stack(acc_runs)
    (end_acc, _ci1), (end_fgt, _ci2), _a, _b, _f = compute_performance(arr)
    return float(end_acc), float(end_fgt)


def paired_stats(ref_mats, ocl_mats):
    """Per-seed paired end-acc / fgt / peak deltas with 95% t-CIs."""
    def decomp(mat):
        peak = mat.max(axis=0).mean()
        end = mat[-1].mean()
        return end, peak - end, peak

    ref = np.array([decomp(m) for m in ref_mats])   # (n, 3)
    ocl = np.array([decomp(m) for m in ocl_mats])
    d = ocl - ref
    out = dict(seeds=len(ref_mats))
    for j, key in enumerate(("acc", "fgt", "peak")):
        out["ref_" + key] = float(ref[:, j].mean())
        out["ocl_" + key] = float(ocl[:, j].mean())
        m, h = _t_ci95(d[:, j])
        out["d_" + key] = m
        out["d_{}_ci95".format(key)] = h
    out["per_seed_d_acc"] = [float(v) for v in d[:, 0]]
    out["per_seed_d_fgt"] = [float(v) for v in d[:, 1]]
    return out


# -------------------------------------------------------------------- main

def _load_rows(json_out, per_class):
    """Freshest on-disk results in the current schema (CI-bearing rows)."""
    try:
        with open(json_out) as f:
            prior = json.load(f)
        if prior.get("args", {}).get("per_class") == per_class:
            return {k: v for k, v in prior.get("results", {}).items()
                    if "d_acc_ci95" in v}
    except Exception:
        pass
    return {}


def _flush(args, own_default, own_arith, startup_rows=None):
    """Merge THIS process's rows into the freshest on-disk results and write.

    Concurrent parity runs own disjoint (row, arith) cells; re-reading the
    json at write time (instead of holding the startup snapshot) means a
    long-running job can no longer revert cells another job landed while it
    was computing. The startup snapshot still serves as a FLOOR: a row this
    process saw at launch can never vanish from the written file (guards
    against a torn concurrent read of json_out returning {} and against any
    intermediate state that dropped a row — no tool ever deletes rows, so
    resurrecting an absent one is always correct). Freshest-on-disk cells
    take precedence over the floor; own rows take precedence over both."""
    rows = dict(startup_rows or {})
    rows.update(_load_rows(args.json_out, args.per_class))
    for name, row in own_default.items():
        merged = dict(row)
        arith = dict(rows.get(name, {}).get("arith", {}))
        arith.update(own_arith.get(name, {}))
        merged["arith"] = arith
        rows[name] = merged
    for name, modes in own_arith.items():
        if name in own_default:
            continue
        if name in rows:
            rows[name].setdefault("arith", {}).update(modes)
    with open(args.json_out, "w") as f:
        json.dump(dict(args=vars(args), results=rows), f, indent=1)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", nargs="+", default=DEFAULT_SWEEP,
                    choices=list(AGENT_CONFIGS), metavar="AGENT")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--per_class", type=int, default=100)
    ap.add_argument("--difficulty", type=float, default=0.85)
    ap.add_argument("--num_tasks", type=int, default=5)
    ap.add_argument("--mem_size", type=int, default=500)
    ap.add_argument("--eps_mem_batch", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--nf", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the ocl_tpu side onto CPU too")
    ap.add_argument("--ref_only", action="store_true",
                    help="compute/cache only the torch side (no JAX backend "
                         "use; safe to run while the TPU is busy)")
    ap.add_argument("--arith", default="default",
                    choices=["default", "cpu_f32", "tpu_highest", "tpu_high"],
                    help="run the ocl side under this arithmetic and store "
                         "it as the row's exact/precision companion instead "
                         "of touching the default columns (cpu_f32 needs "
                         "JAX_PLATFORMS=cpu; reference-exact IEEE f32)")
    ap.add_argument("--import_probe", action="store_true",
                    help="fold the committed probe summaries "
                         "(results/er_drift_probe.json) into the rows' "
                         "arith companions and rewrite the report — no "
                         "computation")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_RESULTS.md"))
    ap.add_argument("--json_out", default=os.path.join(REPO, "parity_results.json"))
    args = ap.parse_args()

    results = {}
    if os.path.exists(args.json_out):
        try:
            with open(args.json_out) as f:
                prior = json.load(f)
            if prior.get("args", {}).get("per_class") == args.per_class:
                # only rows in the current (CI-bearing) schema survive merge
                results = {k: v for k, v in prior.get("results", {}).items()
                           if "d_acc_ci95" in v}
        except Exception:
            pass
    startup_rows = dict(results)

    if args.import_probe:
        probe_path = os.path.join(REPO, "results", "er_drift_probe.json")
        with open(probe_path) as f:
            probe = json.load(f)
        for name, variants in probe.items():
            if name not in results:
                continue
            for mode, stats in variants.items():
                if mode == "tpu_default":  # that IS the default row
                    continue
                # fill-only: a companion measured directly by --arith (and
                # raw-cached under results/parity_raw/probe_*) is fresher
                # than a committed probe summary — never clobber it (the
                # probe JSON can predate framework fixes, e.g. SCR_REVIEW's
                # pre-crop-fix trail, PARITY.md).
                results[name].setdefault("arith", {}).setdefault(mode, stats)
        with open(args.json_out, "w") as f:
            json.dump(dict(args=vars(args), results=results), f, indent=1)
        write_report(args, results)
        return

    if not args.ref_only:
        from ocl_tpu.config import apply_platform_env

        if args.cpu or args.arith == "cpu_f32":
            os.environ["JAX_PLATFORMS"] = "cpu"
        apply_platform_env()
        if args.arith in ("tpu_highest", "tpu_high"):
            import jax

            jax.config.update("jax_default_matmul_precision",
                              args.arith.replace("tpu_", ""))

    if "CNDPM" in args.agents:
        _patch_cndpm_constants()

    stream_cache = {}
    own_default, own_arith = {}, {}
    for name in args.agents:
        cfg = AGENT_CONFIGS[name]
        t0 = time.time()
        ref_mats, ocl_mats = [], []
        for seed in range(args.seeds):
            ref_mats.append(get_side("ref", name, cfg, seed, args,
                                     stream_cache)[0])
            if not args.ref_only:
                ocl_mats.append(get_side("ocl", name, cfg, seed, args,
                                         stream_cache, arith=args.arith)[0])
        if args.ref_only:
            print("[{}] ref cache warm ({} seeds)".format(name, args.seeds),
                  flush=True)
            continue
        row = paired_stats(ref_mats, ocl_mats)
        row["seconds"] = round(time.time() - t0, 1)
        if args.arith != "default":
            if name not in _load_rows(args.json_out, args.per_class):
                sys.exit("no default-arithmetic row for {} — run it first "
                         "so the report has both columns".format(name))
            own_arith.setdefault(name, {})[args.arith] = row
        else:
            own_default[name] = row
        print("[{}{}] dacc {:+.3f}±{:.3f} dfgt {:+.3f}±{:.3f} "
              "dpeak {:+.3f}±{:.3f} ({} seeds)".format(
                  name, "" if args.arith == "default" else " " + args.arith,
                  row["d_acc"], row["d_acc_ci95"], row["d_fgt"],
                  row["d_fgt_ci95"], row["d_peak"], row["d_peak_ci95"],
                  row["seeds"]), flush=True)
        results = _flush(args, own_default, own_arith,
                         startup_rows=startup_rows)

    if not args.ref_only:
        write_report(args, results)


# rows whose SUBJECT is a fast arithmetic mode: judged on their own column,
# labelled so the reader knows the delta is the mode's documented cost
FASTPATH_ROWS = {"ER_BF16", "SCR_BF16"}


def _band(m, h):
    """Against the ±1 pt north star: does the Δacc CI touch [-0.01, +0.01]?"""
    if np.isnan(h):
        return "n=1"
    if -0.01 <= m <= 0.01:
        return "pass"
    if m - h <= 0.01 and m + h >= -0.01:
        return "pass (CI)"
    return "FAIL"


def _band_verdict(name, row):
    """The verdict is DEFINED at reference-exact arithmetic when the row has
    an exact-f32 companion (VERDICT r3 #1); the default-precision delta then
    stands as the documented fast-path cost, not the pass criterion."""
    if name in FASTPATH_ROWS:
        return _band(row["d_acc"], row["d_acc_ci95"]) + " (fast-path)"
    exact = row.get("arith", {}).get("cpu_f32")
    if exact:
        return _band(exact["d_acc"], exact["d_acc_ci95"]) + " @exact"
    return _band(row["d_acc"], row["d_acc_ci95"])


def _exact_cell(row):
    exact = row.get("arith", {}).get("cpu_f32")
    if not exact:
        return "—"
    return "{:+.3f} ± {:.3f} (n={})".format(
        exact["d_acc"], exact["d_acc_ci95"], exact["seeds"])


def write_report(args, results):
    lines = [
        "# PARITY_RESULTS — reference (PyTorch) vs ocl_tpu, same streams",
        "",
        "Produced by `tools/parity_vs_reference.py`: the reference's own agent",
        "and buffer code (driven in-process via `tools/ref_oracle.py`, torch",
        "CPU) and ocl_tpu trained on identical synthetic class-incremental",
        f"streams ({args.num_tasks} tasks, {args.per_class}/class,",
        f"difficulty {args.difficulty}, mem {args.mem_size}, lr {args.lr},",
        "nf {}). Runs are seed-paired; Δ columns are the mean per-seed".format(args.nf),
        "delta ± its 95% t-interval. Metrics via the bit-compatible",
        "`compute_performance` (reference experiment/metrics.py:5-44).",
        "Verdict: 'pass' = |mean Δacc| ≤ 0.01 (the ±1 pt north star);",
        "'pass (CI)' = the CI overlaps the ±1 pt band.",
        "",
        "ARITHMETIC POLICY: the torch reference computes exact IEEE f32 on",
        "CPU; the ocl side's default TPU path rounds f32 convs through",
        "truncated-mantissa MXU passes (PARITY.md, arithmetic ablation).",
        "Where a row has an exact-f32 companion (ocl on XLA:CPU — the same",
        "IEEE f32 arithmetic as torch; 'Δacc exact-f32' column), the verdict",
        "is DEFINED on that column ('@exact') and the default-precision Δacc",
        "stands as the documented fast-path arithmetic cost. ER_BF16 and",
        "SCR_BF16's subjects ARE fast arithmetic modes, so they are judged",
        "on their own column and labelled '(fast-path)'.",
        "",
        "| Agent | n | ref acc | ocl acc | Δacc ± CI (default) | Δacc exact-f32 | ref fgt | ocl fgt | Δfgt ± CI | verdict |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            "| {} | {} | {:.3f} | {:.3f} | {:+.3f} ± {:.3f} | {} | {:.3f} "
            "| {:.3f} | {:+.3f} ± {:.3f} | {} |".format(
                name, r["seeds"], r["ref_acc"], r["ocl_acc"], r["d_acc"],
                r["d_acc_ci95"], _exact_cell(r), r["ref_fgt"], r["ocl_fgt"],
                r["d_fgt"], r["d_fgt_ci95"], _band_verdict(name, r)))
    lines += [
        "",
        "## Peak-vs-end decomposition (the Δfgt anatomy)",
        "",
        "Avg_End_Fgt = mean over tasks of (peak accuracy − end accuracy)",
        "(reference experiment/metrics.py:49-54), so identically",
        "Δfgt = Δpeak − Δacc. A positive Δfgt at Δacc ≥ 0 with Δpeak > 0 is a",
        "peak-height artifact (ocl peaks higher per task), not retention loss.",
        "",
        "| Agent | ref peak | ocl peak | Δpeak ± CI | Δacc (end) | Δfgt |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            "| {} | {:.3f} | {:.3f} | {:+.3f} ± {:.3f} | {:+.3f} | {:+.3f} |".format(
                name, r["ref_peak"], r["ocl_peak"], r["d_peak"],
                r["d_peak_ci95"], r["d_acc"], r["d_fgt"]))
    arith_rows = [(n, r) for n, r in results.items() if r.get("arith")]
    if arith_rows:
        lines += [
            "",
            "## Arithmetic companions (same streams, same torch matrices)",
            "",
            "cpu_f32 = ocl on XLA:CPU (reference-exact IEEE f32 — the",
            "verdict-defining mode); tpu_highest / tpu_high = the MXU's",
            "multi-pass f32 emulations (--matmul_precision).",
            "",
            "| Agent | mode | n | ocl acc | Δacc ± CI | Δfgt ± CI |",
            "|---|---|---|---|---|---|",
        ]
        for name, r in arith_rows:
            for mode, s in r["arith"].items():
                lines.append(
                    "| {} | {} | {} | {:.3f} | {:+.3f} ± {:.3f} "
                    "| {:+.3f} ± {:.3f} |".format(
                        name, mode, s["seeds"], s["ocl_acc"], s["d_acc"],
                        s["d_acc_ci95"], s["d_fgt"], s["d_fgt_ci95"]))
    lines += [
        "",
        "Positive Δacc = ocl_tpu higher. Stochastic trajectories differ by",
        "RNG; agreement is assessed on the run-averaged metrics.",
        "SCR uses functional torch re-implementations of the kornia ops on",
        "the reference side (tools/ref_oracle.py) — augmentation parity is",
        "distributional, not exact.",
        "CNDPM runs both frameworks with sleep budgets shrunk identically to",
        f"{CNDPM_SLEEP_G}/{CNDPM_SLEEP_D} steps (from 4000/1000) and",
        "stm_capacity 200 to fit the torch-CPU oracle budget",
        "(tools/cndpm_full_budget.py runs the full 4000/1000 budget on TPU).",
        "ER_FUSED / SCR_FUSED / ER_BF16 / SCR_BF16 are ocl-only modes",
        "compared against the plain reference ER / SCR (they validate the",
        "fused and bf16 fast paths against the reference's exact schedule).",
        "ER_LABELS / ER_KD / SCR_REVIEW are trick-combination rows",
        "(labels_trick, kd_trick, and the CVPR SCR recipe with review_trick).",
        "ICARL_NOEXCL / ICARL_EVALBN / ICARL_ZEROMEAN are ocl-side ablations",
        "compared against the same reference ICARL runs (PARITY.md §iCaRL).",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
