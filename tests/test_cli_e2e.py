"""End-to-end CLI runs over on-disk fixture datasets (VERDICT r2 #2).

The full chain `general_main.main -> multiple_run -> continuum ->
<Dataset>.download_load -> train -> compute_performance` (reference
general_main.py:9-22, continuum/continuum.py:6-37) is driven through the real
argparse surface with a NON-synthetic dataset name, over miniature on-disk
trees in the real formats (CIFAR pickle batches; CORe50 paths/LUP/labels pkl
+ JPEG tree). A wiring bug between loader and runner (key name, shape order,
val split) fails here even when the loaders pass their unit fixtures.
"""

import os
import pickle
import re

import numpy as np
import pytest


def _balanced_cifar10(root):
    """CIFAR-10 pickle tree with exactly 10 images per class (so every nc
    task has the same size and the scanned program compiles once)."""
    folder = os.path.join(root, "datasets", "cifar10", "cifar-10-batches-py")
    os.makedirs(folder)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        n = 20
        d = {b"data": rng.randint(0, 256, (n, 3072), dtype=np.uint8),
             b"labels": list((np.arange(n) + (i - 1) * n) % 10)}
        with open(os.path.join(folder, f"data_batch_{i}"), "wb") as f:
            pickle.dump(d, f)
    d = {b"data": rng.randint(0, 256, (40, 3072), dtype=np.uint8),
         b"labels": list(np.arange(40) % 10)}
    with open(os.path.join(folder, "test_batch"), "wb") as f:
        pickle.dump(d, f)


def _core50_ni_tree(root):
    """CORe50 'ni' tree at the real task count (8 train tasks + test)."""
    from PIL import Image

    folder = os.path.join(root, "datasets", "core50")
    os.makedirs(os.path.join(folder, "imgs"))
    rng = np.random.RandomState(3)
    n_tasks, per_task, n_test = 8, 4, 4
    n_imgs = n_tasks * per_task + n_test
    paths = []
    for i in range(n_imgs):
        rel = os.path.join("imgs", f"im_{i}.jpg")
        arr = rng.randint(0, 256, (128, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(folder, rel), quality=90)
        paths.append(rel)
    train_tasks = [list(range(t * per_task, (t + 1) * per_task))
                   for t in range(n_tasks)]
    test_idx = list(range(n_tasks * per_task, n_imgs))
    lup = {"ni": [train_tasks + [test_idx]]}
    labels = {"ni": [[[0, 1, 0, 1] for _ in range(n_tasks)] + [[0, 1, 0, 1]]]}
    for name, obj in (("paths.pkl", paths), ("LUP.pkl", lup),
                      ("labels.pkl", labels)):
        with open(os.path.join(folder, name), "wb") as f:
            pickle.dump(obj, f)


def _final_metrics(captured):
    m = re.search(r"Avg_End_Acc \(([-\d.nae]+),.*Avg_End_Fgt \(([-\d.nae]+),",
                  captured)
    assert m, f"no final metrics line in output:\n{captured[-2000:]}"
    return float(m.group(1)), float(m.group(2))


def test_general_main_cifar10_from_disk(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    _balanced_cifar10(str(tmp_path))

    import general_main
    from ocl_tpu.config import build_parser

    args = build_parser().parse_args([
        "--data", "cifar10", "--cl_type", "nc", "--agent", "ER",
        "--num_tasks", "5", "--num_runs", "1", "--mem_size", "50",
        "--eps_mem_batch", "10", "--nf", "4", "--test_batch", "40",
        "--fix_order", "True", "--verbose", "False"])
    general_main.main(args)
    out = capsys.readouterr().out
    acc, fgt = _final_metrics(out)
    assert np.isfinite(acc) and 0.0 <= acc <= 1.0
    assert np.isfinite(fgt) and -1.0 <= fgt <= 1.0


def test_main_config_cifar10_from_disk(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    _balanced_cifar10(str(tmp_path))
    import yaml

    def dump(name, payload):
        p = tmp_path / name
        with open(p, "w") as f:
            yaml.safe_dump({"parameters": payload}, f)
        return str(p)

    general_yml = dump("general.yml", dict(
        num_runs=1, seed=0, optimizer="SGD", learning_rate=0.1,
        batch=10, test_batch=40, mem_size=50, eps_mem_batch=10,
        fix_order=True))
    data_yml = dump("data.yml", dict(data="cifar10", cl_type="nc",
                                     num_tasks=5))
    agent_yml = dump("agent.yml", dict(agent="ER", update="random",
                                       retrieve="random"))

    import main_config

    class Args:
        general, data, agent = general_yml, data_yml, agent_yml
        verbose = False
        nf = 4

    main_config.main(Args())
    out = capsys.readouterr().out
    acc, fgt = _final_metrics(out)
    assert np.isfinite(acc) and 0.0 <= acc <= 1.0


def test_general_main_core50_from_disk(tmp_path, monkeypatch, capsys):
    pytest.importorskip("PIL")
    monkeypatch.chdir(tmp_path)
    _core50_ni_tree(str(tmp_path))

    import general_main
    from ocl_tpu.config import build_parser

    args = build_parser().parse_args([
        "--data", "core50", "--cl_type", "ni", "--agent", "ER",
        "--num_runs", "1", "--batch", "2", "--eps_mem_batch", "2",
        "--mem_size", "20", "--nf", "4", "--test_batch", "4",
        "--verbose", "False"])
    general_main.main(args)
    out = capsys.readouterr().out
    acc, fgt = _final_metrics(out)
    assert np.isfinite(acc) and 0.0 <= acc <= 1.0
