"""Generate committed golden torch-oracle matrices for the CI parity pins.

VERDICT r3 #3: every agent family in the reference registry
(/root/reference/utils/name_match.py:31-40) gets an automated accuracy-parity
guard, but CI cannot afford to run the torch oracle for all of them on the
1-core host. This tool runs the reference's own agent/buffer code
(tools/ref_oracle.py) ONCE per (family, seed) on the CI-sized streams and
commits the raw accuracy matrices as fixtures under
tests/fixtures/parity_golden/; tests/test_reference_parity.py then runs only
the ocl side against the goldens.

The stream/HP constants here are the single source of truth — the CI test
imports them, so the fixtures can never silently drift from the test config.

Usage:  python tools/make_parity_goldens.py [--agents MIR ASER ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "fixtures", "parity_golden")

# CI stream/HP config — identical to the live-torch pins in
# tests/test_reference_parity.py (nf=4 is the 1-core-CPU budget)
CI_SEEDS = (1, 2, 3, 4, 5)
CI_STREAM = dict(per_class=60, difficulty=0.7, num_tasks=3)
CI_HP = dict(mem_size=300, eps_mem_batch=10, lr=0.1, batch=10, nf=4)

# CN-DPM's published sleep budget (4000/1000) is a training run; CI shrinks
# it identically on both frameworks (the torch side here, the ocl side via
# the sleep_step_g/d flags in the test)
CI_CNDPM_SLEEP = (100, 50)

# Reference-visible agent configs per family (flag names are the parity
# contract). ocl_extra carries ocl-only flags the CI test must set to match
# the patched reference constants.
GOLDEN_CONFIGS = {
    "ER": dict(agent="ER", update="random", retrieve="random",
               fused_replay=False),
    "MIR": dict(agent="ER", update="random", retrieve="MIR", subsample=50),
    "GSS": dict(agent="ER", update="GSS", retrieve="random",
                gss_mem_strength=3, gss_batch_size=10, fused_replay=False),
    "ASER": dict(agent="ER", update="ASER", retrieve="ASER",
                 aser_type="asvm", k=3, n_smp_cls=2.0),
    "EWC": dict(agent="EWC", lambda_=100.0, alpha=0.9, fisher_update_after=50),
    "AGEM": dict(agent="AGEM", update="random", retrieve="random"),
    "LWF": dict(agent="LWF"),
    "ICARL": dict(agent="ICARL", update="random", retrieve="random"),
    "GDUMB": dict(agent="GDUMB", mem_epoch=10, minlr=0.0005, clip=10.0),
    "SCR": dict(agent="SCR", update="random", retrieve="random",
                head="mlp", temp=0.07, eps_mem_batch=50, fused_replay=False),
    "CNDPM": dict(agent="CNDPM", stm_capacity=120, classifier_chill=0.01,
                  log_alpha=-300.0),
}

# ocl-only flags the CI test must add per family (not reference-visible)
OCL_EXTRA = {
    "CNDPM": dict(sleep_step_g=CI_CNDPM_SLEEP[0],
                  sleep_step_d=CI_CNDPM_SLEEP[1]),
}


def golden_path(name: str, seed: int) -> str:
    return os.path.join(GOLDEN_DIR, "{}_seed{}.npy".format(name, seed))


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _patch_ref_cndpm_sleep():
    import ref_oracle

    ref_oracle.ensure_reference_importable()
    import models.ndpm.ndpm as rndpm  # star-imported constants live per-module

    rndpm.MODELS_NDPM_NDPM_SLEEP_STEP_G = CI_CNDPM_SLEEP[0]
    rndpm.MODELS_NDPM_NDPM_SLEEP_STEP_D = CI_CNDPM_SLEEP[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", nargs="+", default=list(GOLDEN_CONFIGS),
                    choices=list(GOLDEN_CONFIGS), metavar="AGENT")
    args = ap.parse_args()

    import parity_vs_reference as pv

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    run_args = _Args(**CI_HP)
    manifest = {"seeds": list(CI_SEEDS), "stream": CI_STREAM, "hp": CI_HP,
                "cndpm_sleep": list(CI_CNDPM_SLEEP), "families": {}}
    manifest_path = os.path.join(GOLDEN_DIR, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest["families"] = json.load(f).get("families", {})

    for name in args.agents:
        cfg = GOLDEN_CONFIGS[name]
        if name == "CNDPM":
            _patch_ref_cndpm_sleep()
        for seed in CI_SEEDS:
            path = golden_path(name, seed)
            if os.path.exists(path):
                continue
            tasks, tests = pv.make_stream(seed, CI_STREAM["per_class"],
                                          CI_STREAM["difficulty"],
                                          CI_STREAM["num_tasks"])
            t0 = time.time()
            mat = pv.run_ref_side(cfg, tasks, tests, seed, run_args)
            np.save(path + ".tmp.npy", mat)
            os.replace(path + ".tmp.npy", path)
            print("  [{} seed {}] {:.0f}s end_acc {:.3f}".format(
                name, seed, time.time() - t0, mat[-1].mean()), flush=True)
        manifest["families"][name] = dict(cfg)
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True, default=str)
        print("[{}] goldens complete".format(name), flush=True)


if __name__ == "__main__":
    main()
