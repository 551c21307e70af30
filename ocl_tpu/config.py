"""Configuration: argparse facade + layered YAML loading.

Mirrors the reference flag surface (reference: general_main.py:27-189) and the
4-file YAML layering of main_tune.py:13-23 / main_config.py:12-17, exposed as a
single SimpleNamespace ("params") threaded through the framework.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

import yaml

DEFAULT_TRICK = {
    "labels_trick": False,
    "kd_trick": False,
    "separated_softmax": False,
    "review_trick": False,
    "ncm_trick": False,
    "kd_trick_star": False,
}

# Per-dataset input shapes, stored NHWC (TPU-native layout; the reference keeps
# NCHW per torch convention, utils/setup_elements.py:11-17).
input_size_match = {
    "cifar100": [32, 32, 3],
    "cifar10": [32, 32, 3],
    "core50": [128, 128, 3],
    "mini_imagenet": [84, 84, 3],
    "openloris": [50, 50, 3],
    "synthetic": [32, 32, 3],
}

n_classes_match = {
    "cifar100": 100,
    "cifar10": 10,
    "core50": 50,
    "mini_imagenet": 100,
    "openloris": 69,
    "synthetic": 10,
}


def boolean_string(s):
    if isinstance(s, bool):
        return s
    if s not in {"False", "True"}:
        raise ValueError("Not a valid boolean string")
    return s == "True"


def build_parser() -> argparse.ArgumentParser:
    """Flag surface mirroring the reference CLI (general_main.py:27-189)."""
    parser = argparse.ArgumentParser(description="Online Continual Learning (TPU / JAX)")
    # General
    parser.add_argument("--num_runs", dest="num_runs", default=1, type=int)
    parser.add_argument("--seed", dest="seed", default=0, type=int)
    # Misc
    parser.add_argument("--val_size", dest="val_size", default=0.1, type=float)
    parser.add_argument("--num_val", dest="num_val", default=3, type=int)
    parser.add_argument("--num_runs_val", dest="num_runs_val", default=3, type=int)
    parser.add_argument("--error_analysis", dest="error_analysis", default=False, type=boolean_string)
    parser.add_argument("--verbose", type=boolean_string, default=True)
    parser.add_argument("--store", type=boolean_string, default=False)
    parser.add_argument("--save-path", dest="save_path", default=None)
    # Agent
    parser.add_argument("--agent", dest="agent", default="ER",
                        choices=["ER", "EWC", "AGEM", "CNDPM", "LWF", "ICARL", "GDUMB", "ASER", "SCR"])
    parser.add_argument("--update", dest="update", default="random", choices=["random", "GSS", "ASER"])
    parser.add_argument("--retrieve", dest="retrieve", default="random",
                        choices=["MIR", "random", "ASER", "match", "mem_match"])
    # Optimizer
    parser.add_argument("--optimizer", dest="optimizer", default="SGD", choices=["SGD", "Adam"])
    parser.add_argument("--learning_rate", dest="learning_rate", default=0.1, type=float)
    parser.add_argument("--epoch", dest="epoch", default=1, type=int)
    parser.add_argument("--batch", dest="batch", default=10, type=int)
    parser.add_argument("--test_batch", dest="test_batch", default=128, type=int)
    parser.add_argument("--weight_decay", dest="weight_decay", type=float, default=0)
    # Data
    parser.add_argument("--num_tasks", dest="num_tasks", default=10, type=int)
    parser.add_argument("--fix_order", dest="fix_order", default=False, type=boolean_string)
    parser.add_argument("--plot_sample", dest="plot_sample", default=False, type=boolean_string)
    parser.add_argument("--data", dest="data", default="cifar10")
    parser.add_argument("--cl_type", dest="cl_type", default="nc", choices=["nc", "ni"])
    parser.add_argument("--ns_factor", dest="ns_factor", nargs="+",
                        default=(0.0, 0.4, 0.8, 1.2, 1.6, 2.0, 2.4, 2.8, 3.2, 3.6), type=float)
    parser.add_argument("--ns_type", dest="ns_type", default="noise", type=str,
                        choices=["noise", "occlusion", "blur"])
    parser.add_argument("--ns_task", dest="ns_task", nargs="+", default=(1, 1, 2, 2, 2, 2), type=int)
    parser.add_argument("--online", dest="online", default=True, type=boolean_string)
    # ER
    parser.add_argument("--mem_size", dest="mem_size", default=10000, type=int)
    parser.add_argument("--eps_mem_batch", dest="eps_mem_batch", default=10, type=int)
    # EWC
    parser.add_argument("--lambda", dest="lambda_", default=100, type=float)
    parser.add_argument("--alpha", dest="alpha", default=0.9, type=float)
    parser.add_argument("--fisher_update_after", dest="fisher_update_after", type=int, default=50)
    # MIR
    parser.add_argument("--subsample", dest="subsample", default=50, type=int)
    # GSS
    parser.add_argument("--gss_mem_strength", dest="gss_mem_strength", default=10, type=int)
    parser.add_argument("--gss_batch_size", dest="gss_batch_size", default=10, type=int)
    # ASER
    parser.add_argument("--k", dest="k", default=5, type=int)
    parser.add_argument("--aser_type", dest="aser_type", default="asvm", type=str,
                        choices=["neg_sv", "asv", "asvm"])
    parser.add_argument("--n_smp_cls", dest="n_smp_cls", default=2.0, type=float)
    # CNDPM
    parser.add_argument("--stm_capacity", dest="stm_capacity", default=1000, type=int)
    parser.add_argument("--classifier_chill", dest="classifier_chill", default=0.01, type=float)
    parser.add_argument("--log_alpha", dest="log_alpha", default=-300, type=float)
    # GDumb
    parser.add_argument("--minlr", dest="minlr", default=0.0005, type=float)
    parser.add_argument("--clip", dest="clip", default=10.0, type=float)
    parser.add_argument("--mem_epoch", dest="mem_epoch", default=70, type=int)
    # Tricks
    parser.add_argument("--labels_trick", dest="labels_trick", default=False, type=boolean_string)
    parser.add_argument("--separated_softmax", dest="separated_softmax", default=False, type=boolean_string)
    parser.add_argument("--kd_trick", dest="kd_trick", default=False, type=boolean_string)
    parser.add_argument("--kd_trick_star", dest="kd_trick_star", default=False, type=boolean_string)
    parser.add_argument("--review_trick", dest="review_trick", default=False, type=boolean_string)
    parser.add_argument("--ncm_trick", dest="ncm_trick", default=False, type=boolean_string)
    parser.add_argument("--mem_iters", dest="mem_iters", default=1, type=int)
    # Early stopping
    parser.add_argument("--min_delta", dest="min_delta", default=0.0, type=float)
    parser.add_argument("--patience", dest="patience", default=0, type=int)
    parser.add_argument("--cumulative_delta", dest="cumulative_delta", default=False, type=boolean_string)
    # SupContrast
    parser.add_argument("--temp", type=float, default=0.07)
    parser.add_argument("--buffer_tracker", type=boolean_string, default=False,
                        help="print + consistency-check the buffer's per-class "
                             "counts after every task (the reference's "
                             "BufferClassTracker.check_tracker; the class-index "
                             "cache itself is always-on here as the "
                             "class_counts device array)")
    parser.add_argument("--warmup", type=int, default=4)
    parser.add_argument("--head", type=str, default="mlp")
    # TPU-specific extensions (not in the reference)
    parser.add_argument("--n_devices", dest="n_devices", default=0, type=int,
                        help="devices to shard eval over; 0 = all available")
    parser.add_argument("--synthetic_size", dest="synthetic_size", default=2000, type=int,
                        help="train images per class for the synthetic dataset")
    parser.add_argument("--synthetic_difficulty", dest="synthetic_difficulty",
                        default=0.0, type=float,
                        help="0..1: shrinks class separation / raises noise")
    parser.add_argument("--nf", dest="nf", default=20, type=int,
                        help="backbone width (reference fixes nf=20; smaller for CPU tests)")
    parser.add_argument("--max_experts", dest="max_experts", default=10, type=int,
                        help="CN-DPM expert-slot capacity (static shapes on TPU)")
    parser.add_argument("--parallel_runs", dest="parallel_runs", default=False,
                        type=boolean_string,
                        help="train all num_runs runs as one program, one run "
                             "per device on a multi-chip mesh (falls back to "
                             "sequential runs on a single device)")
    parser.add_argument("--ckpt_dir", dest="ckpt_dir", default=None,
                        help="checkpoint the full train state after every task "
                             "and resume from it on restart")
    parser.add_argument("--fused_replay", dest="fused_replay", default=True,
                        type=boolean_string,
                        help="ER with random/match retrieval: one fused "
                             "forward/backward over batch+memory (default; "
                             "~1.25x step speed at 95%% of the bare fwd/bwd "
                             "floor). BN folds one combined statistic instead "
                             "of the reference's two sequential folds — "
                             "accuracy-parity-verified (PARITY_RESULTS.md "
                             "ER_FUSED row); pass False for the reference's "
                             "exact two-pass schedule")
    parser.add_argument("--scr_review_dead_forward",
                        dest="scr_review_dead_forward", default=True,
                        type=boolean_string,
                        help="SCR + review_trick: reproduce the reference "
                             "review step's dead forward (agents/base.py:77 "
                             "computes logits it immediately overwrites for "
                             "SCR), whose only effect is folding the identity "
                             "batch's BN moments one extra time per review "
                             "batch ([id, id, aug] vs [id, aug]). Default "
                             "True = reference semantics (closes a ~+1 pt "
                             "SCR_REVIEW parity residual, "
                             "results/scr_hue_law.json); False drops the "
                             "extra fold (and its extra forward)")
    parser.add_argument("--scan_unroll", dest="scan_unroll",
                        default=(int(os.environ["OCL_TPU_SCAN_UNROLL"])
                                 if "OCL_TPU_SCAN_UNROLL" in os.environ
                                 else None),
                        type=int,
                        help="unroll factor for the per-task step scan "
                             "(amortizes loop bookkeeping: ~+9%% throughput "
                             "at 4 on TPU; raises compile time — defaults to "
                             "4 on TPU and 1 on CPU, where scan-body compile "
                             "cost dominates; tests pin it to 1 via "
                             "OCL_TPU_SCAN_UNROLL)")
    parser.add_argument("--compute_dtype", dest="compute_dtype", default="fp32",
                        choices=["fp32", "bf16"],
                        help="forward/backward compute precision: bf16 runs "
                             "convs/matmuls MXU-native (~1.2x step speed; BN "
                             "statistics, losses, and optimizer state stay "
                             "f32). fp32 is exact reference parity.")
    parser.add_argument("--core50_cache", dest="core50_cache", default=True,
                        type=boolean_string,
                        help="md5-keyed decoded-image bin cache for CORe50 "
                             "(reference core50.py:100-158, enabled here)")
    parser.add_argument("--debug_nans", dest="debug_nans", default=False,
                        type=boolean_string,
                        help="debug mode: enable jax_debug_nans and raise "
                             "FloatingPointError on any non-finite task loss "
                             "(SURVEY.md §5.2 sanitizer replacement)")
    parser.add_argument("--matmul_precision", dest="matmul_precision",
                        default="default",
                        choices=["default", "high", "highest"],
                        help="XLA precision for f32 convs/matmuls: 'default' "
                             "uses fast truncated-mantissa MXU passes; "
                             "'highest' is f32-exact (multi-pass) — the "
                             "exact-parity arithmetic mode (PARITY.md "
                             "arithmetic ablation). Ignored under "
                             "--compute_dtype bf16.")
    return parser


def maybe_enable_debug_nans(params) -> None:
    """Turn on JAX's NaN checker when --debug_nans is set (SURVEY.md §5.2).

    The per-step finite-loss assert lives in agents/base.py:train_task; this
    global flag additionally makes XLA re-run offending ops un-jitted so the
    failing primitive is named in the traceback.
    """
    if getattr(params, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)


def apply_runtime_flags(params) -> None:
    """Apply process-global JAX flags derived from params (--debug_nans,
    --matmul_precision). Called by the runner entry points before any
    program is traced."""
    maybe_enable_debug_nans(params)
    prec = getattr(params, "matmul_precision", "default")
    if prec and prec != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", prec)


def finalize(params: SimpleNamespace) -> SimpleNamespace:
    """Fill derived fields (reference: general_main.py:19-21 trick dict)."""
    if not hasattr(params, "trick") or params.trick is None:
        params.trick = {k: bool(getattr(params, k, False)) for k in DEFAULT_TRICK}
    for key, default in DEFAULT_TRICK.items():
        params.trick.setdefault(key, default)
    params.cuda = False  # kept for flag parity with the reference namespace
    for key, val in default_params_ns().__dict__.items():
        if not hasattr(params, key):
            setattr(params, key, val)
    if getattr(params, "scan_unroll", None) is None:
        # unroll 4 pays ~4x scan-body compile cost — worth it on TPU (fast
        # compiles, +9% steady-state), ruinous on this 1-core CPU host
        params.scan_unroll = 1 if _platform_is_cpu() else 4
    return params


def _platform_is_cpu() -> bool:
    """Best-effort platform probe without initializing a backend: the env var
    (apply_platform_env re-applies it) or jax.config's current value."""
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        try:
            import jax

            plat = jax.config.jax_platforms or ""
        except Exception:
            plat = ""
    return plat.split(",")[0].strip().lower() == "cpu"


def default_params_ns() -> SimpleNamespace:
    return SimpleNamespace(**{a.dest: a.default for a in build_parser()._actions
                              if a.dest != "help"})


def default_params(**overrides) -> SimpleNamespace:
    """A fully-populated params namespace; handy for tests and library use."""
    ns = default_params_ns()
    for key, val in overrides.items():
        setattr(ns, key, val)
    ns.trick = None
    return finalize(ns)


def load_yaml(path, key="parameters"):
    """Reference: utils/io.py:7-12."""
    with open(path, "r") as stream:
        return yaml.load(stream, Loader=yaml.FullLoader)[key]


def merge_yaml_params(*yaml_dicts, **extra) -> SimpleNamespace:
    """Dict-union merge of layered YAML namespaces (reference: main_tune.py:13-23)."""
    merged = {}
    for d in yaml_dicts:
        if d:
            merged.update(d)
    merged.update(extra)
    return finalize(SimpleNamespace(**merged))


def host_cache_dir(name: str) -> str:
    """~/.cache/<name>-<cpu fingerprint>: XLA:CPU AOT cache entries bake in
    the compile host's CPU features, and reusing a cache written on a
    different machine silently changes fp-contraction numerics (and risks
    SIGILL) — so the persistent cache is keyed per CPU feature set."""
    import hashlib

    fp = "unknown"
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                # flags alone are not enough: LLVM tuning attributes (e.g.
                # prefer-no-gather) derive from the CPU *model*, so two hosts
                # with identical flags can still produce differently-tuned
                # AOT code. (Note the cpu_aot_loader "feature not supported"
                # warning is NOT a reliable contamination signal: it fires
                # even when reloading an entry this same host wrote, because
                # the loader compares LLVM target attrs against a
                # cpuid-derived list that lacks tuning prefs.)
                if key in ("vendor_id", "cpu family", "model", "stepping",
                           "model name", "flags"):
                    parts.append(" ".join(sorted(line.split(":")[1].split())))
                if key == "power management":  # end of first CPU block
                    break
        if parts:
            fp = hashlib.md5("|".join(parts).encode()).hexdigest()[:10]
    except OSError:
        pass
    return os.path.expanduser("~/.cache/{}-{}".format(name, fp))


def apply_platform_env():
    """Honor JAX_PLATFORMS even when a sitecustomize plugin force-set
    jax_platforms after import (this image's axon register() does): re-apply
    the env var via jax.config before first backend use. Also enables the
    persistent compilation cache — compiles dominate cold-start time for the
    scanned task programs."""
    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    cache_dir = os.environ.get("OCL_TPU_CACHE", host_cache_dir("ocl_tpu_xla"))
    if cache_dir != "off":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass
