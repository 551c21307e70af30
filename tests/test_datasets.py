"""Fixture tests for the real-format dataset loaders.

Each loader (reference continuum/dataset_scripts/*.py protocols) is exercised
against a tiny on-disk fixture tree written into tmp_path: CIFAR pickle
batches, mini-imagenet kaggle cache pickles, CORe50 paths/LUP/labels pkl +
JPEG tree (+ bin cache), and an OpenLORIS factor dir. Asserts shapes, labels,
splits, and dtype conventions.
"""

import os
import pickle

import numpy as np
import pytest

from ocl_tpu.config import default_params


def _params(**kw):
    kw.setdefault("num_runs", 1)
    return default_params(verbose=False, val_size=0.0, **kw)


# ------------------------------------------------------------------ fixtures

def write_cifar10(root):
    folder = os.path.join(root, "datasets", "cifar10", "cifar-10-batches-py")
    os.makedirs(folder)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        n = 20
        d = {b"data": rng.randint(0, 256, (n, 3072), dtype=np.uint8).astype(np.uint8),
             b"labels": list(rng.randint(0, 10, n))}
        with open(os.path.join(folder, f"data_batch_{i}"), "wb") as f:
            pickle.dump(d, f)
    d = {b"data": rng.randint(0, 256, (40, 3072), dtype=np.uint8),
         b"labels": list(np.arange(40) % 10)}
    with open(os.path.join(folder, "test_batch"), "wb") as f:
        pickle.dump(d, f)


def write_cifar100(root):
    folder = os.path.join(root, "datasets", "cifar100", "cifar-100-python")
    os.makedirs(folder)
    rng = np.random.RandomState(1)
    for name, n in (("train", 200), ("test", 100)):
        d = {b"data": rng.randint(0, 256, (n, 3072), dtype=np.uint8),
             b"fine_labels": list(np.arange(n) % 100)}
        with open(os.path.join(folder, name), "wb") as f:
            pickle.dump(d, f)


def write_mini_imagenet(root):
    folder = os.path.join(root, "datasets", "mini_imagenet")
    os.makedirs(folder)
    rng = np.random.RandomState(2)
    for split, n_cls in (("train", 64), ("val", 16), ("test", 20)):
        d = {"image_data": rng.randint(
            0, 256, (n_cls * 600, 84, 84, 3), dtype=np.uint8)}
        with open(os.path.join(folder, f"mini-imagenet-cache-{split}.pkl"), "wb") as f:
            pickle.dump(d, f)


def write_core50(root, n_imgs=12):
    from PIL import Image

    folder = os.path.join(root, "datasets", "core50")
    os.makedirs(os.path.join(folder, "imgs"))
    rng = np.random.RandomState(3)
    paths = []
    for i in range(n_imgs):
        rel = os.path.join("imgs", f"im_{i}.jpg")
        arr = rng.randint(0, 256, (128, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(folder, rel), quality=90)
        paths.append(rel)
    # scenario "ni": per run, list of task index-lists; [-1] = test split
    train_tasks = [[0, 1, 2, 3], [4, 5, 6, 7]]
    test_idx = [8, 9, 10, 11]
    lup = {"ni": [train_tasks + [test_idx]]}
    labels = {"ni": [[[0, 0, 1, 1], [0, 1, 0, 1]] + [[0, 1, 0, 1]]]}
    for name, obj in (("paths.pkl", paths), ("LUP.pkl", lup), ("labels.pkl", labels)):
        with open(os.path.join(folder, name), "wb") as f:
            pickle.dump(obj, f)


def write_openloris(root, factor="illumination", n_tasks=9):
    from PIL import Image

    from ocl_tpu.data.openloris_objects import DATAPATH

    rng = np.random.RandomState(4)
    for task in (1, 2):  # only two tasks materialized; others glob empty
        for split in ("train", "test"):
            for obj in DATAPATH[:3]:
                d = os.path.join(root, "datasets", "openloris", factor, split,
                                 f"task{task}", obj)
                os.makedirs(d)
                for j in range(2):
                    arr = rng.randint(0, 256, (60, 70, 3), dtype=np.uint8)
                    Image.fromarray(arr).save(os.path.join(d, f"{j}.jpg"))


# --------------------------------------------------------------------- tests

def test_cifar10_loader(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    write_cifar10(str(tmp_path))
    from ocl_tpu.data.datasets import CIFAR10

    ds = CIFAR10("nc", _params(data="cifar10", cl_type="nc", num_tasks=5,
                               fix_order=True))
    assert ds.train_data.shape == (100, 32, 32, 3)
    assert ds.train_data.dtype == np.uint8
    assert ds.test_data.shape == (40, 32, 32, 3)
    ds.new_run()
    x, y, labels = ds.new_task(0)
    assert x.dtype == np.float32 and 0.0 <= x.min() and x.max() <= 1.0
    assert set(np.unique(y)) == set(labels) == {0, 1}  # fix_order: classes in order
    # pixel fidelity: float task data is exactly uint8/255 of the source rows
    src = ds.train_data[np.isin(ds.train_label, list(labels))]
    assert np.allclose(np.sort(x.reshape(len(x), -1), axis=0),
                       np.sort(src.reshape(len(src), -1) / 255.0, axis=0))


def test_cifar100_loader(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    write_cifar100(str(tmp_path))
    from ocl_tpu.data.datasets import CIFAR100

    ds = CIFAR100("nc", _params(data="cifar100", cl_type="nc", num_tasks=10,
                                fix_order=True))
    assert ds.train_data.shape == (200, 32, 32, 3)
    assert ds.train_label.max() == 99
    ds.new_run()
    x, y, labels = ds.new_task(3)
    assert labels == [30, 31, 32, 33, 34, 35, 36, 37, 38, 39]
    assert ds.get_test_set()[3][0].dtype == np.float32


def test_mini_imagenet_resplit(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    write_mini_imagenet(str(tmp_path))
    from ocl_tpu.data.datasets import Mini_ImageNet

    ds = Mini_ImageNet("nc", _params(data="mini_imagenet", cl_type="nc",
                                     num_tasks=10, fix_order=True))
    # 5/6 - 1/6 resplit per class (reference mini_imagenet.py:20-50)
    assert ds.train_data.shape == (100 * 500, 84, 84, 3)
    assert ds.test_data.shape == (100 * 100, 84, 84, 3)
    for c in (0, 42, 99):
        assert int((ds.train_label == c).sum()) == 500
        assert int((ds.test_label == c).sum()) == 100


def test_core50_loader_and_bin_cache(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    write_core50(str(tmp_path))
    from ocl_tpu.data.datasets import CORE50

    params = _params(data="core50", cl_type="ni", core50_cache=True)
    ds = CORE50("ni", params)
    ds.task_nums = 2  # fixture has 2 tasks (real ni has 8)
    ds.new_run(cur_run=0)
    assert ds.test_data.shape == (4, 128, 128, 3)
    assert list(ds.test_label) == [0, 1, 0, 1]
    x, y, labels = ds.new_task(0, cur_run=0)
    assert x.shape == (4, 128, 128, 3) and x.dtype == np.float32
    assert sorted(labels) == [0, 1]
    # decoded arrays were cached...
    cache_dir = tmp_path / "datasets" / "core50" / "bin_cache"
    assert len(list(cache_dir.glob("*_x.bin"))) >= 2
    # ...and a second run loads from the cache even with the JPEGs gone
    for p in (tmp_path / "datasets" / "core50" / "imgs").glob("*.jpg"):
        p.unlink()
    ds2 = CORE50("ni", params)
    ds2.task_nums = 2
    ds2.new_run(cur_run=0)
    assert np.array_equal(ds2.test_data, ds.test_data)
    x2, y2, _ = ds2.new_task(0, cur_run=0)
    assert y2.shape == y.shape


def test_openloris_loader(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    write_openloris(str(tmp_path))
    from ocl_tpu.data.datasets import OpenLORIS

    ds = OpenLORIS("ni", _params(data="openloris", cl_type="ni",
                                 ns_type="illumination"))
    assert ds.task_nums == 9
    x, y, labels = ds.new_task(0)
    assert x.shape == (6, 50, 50, 3) and x.dtype == np.float32  # resized
    assert sorted(set(y.tolist())) == [0, 1, 2]
    assert ds.test_set[1][0].shape == (6, 50, 50, 3)
    assert ds.train_set[2][0].shape[0] == 0  # unmaterialized task is empty


def test_core50_run_cap():
    from ocl_tpu.data.datasets import CORE50

    with pytest.raises(Exception, match="max number of runs"):
        CORE50("ni", _params(data="core50", num_runs=11))
