"""Regenerate config/ and config_CVPR/ to exact value-parity with the reference.

The YAML hyperparameter trees are part of the reference's public API surface
(reference: config/**, config_CVPR/**; consumed by main_tune.py / main_config.py)
— the file names and key/value contents are the parity contract, so this tool
mirrors them exactly: every reference .yml is parsed (yaml.safe_load) and
re-emitted in this repo's canonical serialization. No reference text is copied;
only the parsed parameter data (which IS the spec) flows through.

On top of the mirrored tree, the tool emits repo-specific additions under
config/data/synthetic/ for the file-free Synthetic dataset used by CI/bench.

Run from the repo root:  python tools/sync_configs.py [--reference /root/reference]
Verification lives in tests/test_config_parity.py.
"""

from __future__ import annotations

import argparse
import os
import shutil

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Repo-specific additions (not in the reference): data configs for the
# Synthetic dataset (ocl_tpu/data/datasets.py:Synthetic).
SYNTHETIC_EXTRAS = {
    "config/data/synthetic/synthetic_nc.yml": {
        "data": "synthetic", "cl_type": "nc", "num_tasks": 5,
    },
    "config/data/synthetic/synthetic_noise.yml": {
        "data": "synthetic", "cl_type": "ni", "ns_type": "noise",
        "num_tasks": 5,
        "ns_factor": [0.0, 0.4, 0.8, 1.2, 1.6],
    },
    "config/data/synthetic/synthetic_occlusion.yml": {
        "data": "synthetic", "cl_type": "ni", "ns_type": "occlusion",
        "num_tasks": 5,
        "ns_factor": [0.0, 0.1, 0.2, 0.3, 0.4],
    },
    "config/data/synthetic/synthetic_blur.yml": {
        "data": "synthetic", "cl_type": "ni", "ns_type": "blur",
        "num_tasks": 5,
        "ns_factor": [0.0, 0.4, 0.8, 1.2, 1.6],
    },
}


def ref_yaml_files(reference):
    out = []
    for tree in ("config", "config_CVPR"):
        base = os.path.join(reference, tree)
        for dirpath, _dirs, files in os.walk(base):
            for fn in sorted(files):
                if fn.endswith(".yml") or fn.endswith(".yaml"):
                    out.append(os.path.relpath(os.path.join(dirpath, fn), reference))
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    # Wipe the existing trees so stale/invented files cannot survive.
    for tree in ("config", "config_CVPR"):
        full = os.path.join(ROOT, tree)
        if os.path.isdir(full):
            shutil.rmtree(full)

    n = 0
    for rel in ref_yaml_files(args.reference):
        with open(os.path.join(args.reference, rel)) as f:
            doc = yaml.safe_load(f)
        dst = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            yaml.safe_dump(doc, f, sort_keys=False)
        n += 1

    for rel, params in SYNTHETIC_EXTRAS.items():
        dst = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            yaml.safe_dump({"parameters": params}, f, sort_keys=False)
        n += 1

    print(f"wrote {n} yaml files")


if __name__ == "__main__":
    main()
