"""Config-tree parity against the reference (reference: config/**, config_CVPR/**).

The YAML trees are a public-API parity contract: main_tune.py / main_config.py
address files by these exact relative paths and the hyperparameter values are
the published paper-reproduction settings. These tests assert (a) every
reference .yml exists here, and (b) each file parses to the identical document
(full value equality, not just key sets). Skipped when /root/reference is not
mounted (e.g. a standalone checkout of this framework).
"""

import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("OCL_REFERENCE_DIR", "/root/reference")

pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "config")),
        reason="reference checkout not available",
    ),
]


def _yaml_files(root):
    out = []
    for tree in ("config", "config_CVPR"):
        for dirpath, _dirs, files in os.walk(os.path.join(root, tree)):
            for fn in files:
                if fn.endswith((".yml", ".yaml")):
                    out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(out)


def test_no_reference_config_missing():
    ref = set(_yaml_files(REFERENCE))
    ours = set(_yaml_files(REPO))
    missing = sorted(ref - ours)
    assert not missing, f"{len(missing)} reference configs missing: {missing[:10]}"


def test_extras_are_documented_additions():
    # Anything beyond the reference tree must be a deliberate repo addition
    # (the Synthetic dataset configs emitted by tools/sync_configs.py).
    ref = set(_yaml_files(REFERENCE))
    extras = sorted(set(_yaml_files(REPO)) - ref)
    assert all(e.startswith("config/data/synthetic/") for e in extras), extras


def test_config_values_match_reference():
    mismatched = []
    for rel in _yaml_files(REFERENCE):
        with open(os.path.join(REFERENCE, rel)) as f:
            ref_doc = yaml.safe_load(f)
        with open(os.path.join(REPO, rel)) as f:
            our_doc = yaml.safe_load(f)
        if ref_doc != our_doc:
            mismatched.append(rel)
    assert not mismatched, f"value mismatch in {mismatched[:10]}"
