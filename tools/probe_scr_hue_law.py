"""Localize the SCR_REVIEW parity residual to the color-jitter HUE law.

After the crop-law fix, SCR_REVIEW still sits at Δacc +0.018 ± 0.014
(default arithmetic) and +0.029 ± 0.010 at --matmul_precision highest —
a residual that does NOT collapse at near-exact arithmetic, while
ER_REVIEW (the same review machinery with no augs) does. The remaining
distributional difference between the two sides is the jitter HUE op:

  * ocl (ops/augment.py)           — true HSV rotation by hf ~ U(-.1,.1)
                                     TURNS (torchvision semantics)
  * oracle stub (tools/ref_oracle) — |hf| roll-blend approximation, a
                                     ~3× weaker perturbation (mean |Δpx|
                                     0.017 vs 0.051) that also
                                     desaturates (S 0.667→0.635) where
                                     true hue rotation preserves S exactly
  * kornia 0.4.1 (the REFERENCE's pin, agents/scr.py:21) — its
                                     adjust_hue consumes the factor as
                                     RADIANS, so hue=0.1 shifts ≤0.016
                                     turns: ~6× weaker than torchvision's
                                     law (unverifiable on this host — no
                                     kornia, no network — so treated as a
                                     hypothesis, not a fact).

This probe re-runs the ocl side ONLY (the cached torch matrices are the
fixed reference) with the hue law swapped:

  * rollblend — the oracle stub's exact law. SAME-LAW CONTROL: with both
                sides augmenting identically (up to RNG engines), a Δacc
                collapse localizes the residual entirely to the hue law.
  * radians   — kornia-0.4.1 semantics. If the reference's effective hue
                augmentation is this weak, this is the parity-faithful
                ocl law.

Usage: python tools/probe_scr_hue_law.py --agents SCR_REVIEW --seeds 10
       [--laws rollblend radians]
Writes results/scr_hue_law.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import parity_vs_reference as P  # noqa: E402


def law_key(law, cfg, seed, args):
    base = os.path.basename(P._cache_key("ocl", cfg, seed, args))
    return os.path.join(P.RAW_DIR, "probe_hue_{}_{}".format(law, base))


# second probed dimension: the reference review step's dead forward
# (agents/base.py:77) folds the identity batch's BN moments one extra
# time per review batch — [id, id, aug] vs ocl's [id, aug]. ER_REVIEW
# structurally cannot catch this (for CE agents that forward IS the loss
# input; only SCR runs three forwards), so it is probed here.
DEAD_FWD_KEY = "scr_review_dead_forward"


def run_law(law, name, cfg, seeds, args, variant=None):
    import ocl_tpu.agents.scr as scr_mod
    from ocl_tpu.ops.augment import scr_transform

    variant = variant or law
    scr_mod.scr_transform = functools.partial(scr_transform, hue_law=law)
    try:
        mats, stream_cache = [], {}
        for seed in seeds:
            path = law_key(variant, cfg, seed, args)
            mat = P._cached(path)
            if mat is None:
                if seed not in stream_cache:
                    stream_cache.clear()
                    stream_cache[seed] = P.make_stream(
                        seed + 1, args.per_class, args.difficulty,
                        args.num_tasks)
                tasks, tests = stream_cache[seed]
                mat = P.run_ocl_side(cfg, tasks, tests, seed, args)
                P._store(path, mat)
                print("  [{} {} seed {}] end_acc {:.3f}".format(
                    name, variant, seed, mat[-1].mean()), flush=True)
            mats.append(mat)
        return mats
    finally:
        scr_mod.scr_transform = scr_transform


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", nargs="+", default=["SCR_REVIEW"])
    ap.add_argument("--laws", nargs="+", default=["rollblend", "radians"],
                    choices=["rollblend", "radians", "turns"])
    ap.add_argument("--dead_forward", action="store_true",
                    help="also reproduce the reference review step's dead "
                         "forward (extra BN fold) on the ocl side")
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--num_tasks", type=int, default=5)
    ap.add_argument("--per_class", type=int, default=100)
    ap.add_argument("--difficulty", type=float, default=0.85)
    ap.add_argument("--mem_size", type=int, default=500)
    ap.add_argument("--eps_mem_batch", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--nf", type=int, default=20)
    args = ap.parse_args()

    from ocl_tpu.config import apply_platform_env

    apply_platform_env()

    out_path = os.path.join(REPO, "results", "scr_hue_law.json")
    out = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)

    seeds = list(range(args.seeds))
    for name in args.agents:
        cfg = dict(P.AGENT_CONFIGS[name])
        stream_cache = {}
        ref_mats = [P.get_side("ref", name, cfg, s, args, stream_cache)[0]
                    for s in seeds]
        # set unconditionally: AGENT_CONFIGS[SCR_REVIEW] now carries the key
        # with default True, so the no-dead-fwd baseline variants must
        # explicitly force it off (ADVICE r4 — otherwise --dead_forward is a
        # no-op and a rerun would overwrite the committed no-dead-fwd rows
        # with mislabeled dead-fwd-on numbers)
        cfg[DEAD_FWD_KEY] = bool(args.dead_forward)  # changes the cache key
        for law in args.laws:
            variant = law + ("+deadfwd" if args.dead_forward else "")
            ocl_mats = run_law(law, name, cfg, seeds, args, variant=variant)
            row = P.paired_stats(ref_mats, ocl_mats)
            out.setdefault(name, {})[variant] = row
            print("[{} hue={}] dacc {:+.3f}±{:.3f} dfgt {:+.3f}±{:.3f}".format(
                name, variant, row["d_acc"], row["d_acc_ci95"],
                row["d_fgt"], row["d_fgt_ci95"]), flush=True)
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
