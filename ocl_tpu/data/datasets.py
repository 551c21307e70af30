"""Dataset objects: raw-file loaders + synthetic stream.

Re-designs the reference's continuum/dataset_scripts/* without the
torch/torchvision dependency: CIFAR reads the standard python-pickle batch
files, Mini-ImageNet its kaggle cache pickles, CORe50 its pkl/LUP protocol,
OpenLORIS its per-factor jpg tree. `new_task` always returns
(x float32 NHWC in [0,1], y int array, labels set).

`Synthetic` is an addition for machines without datasets on disk (CI / bench):
a class-clustered Gaussian image stream with the same NC/NI protocol.
"""

from __future__ import annotations

import glob
import os
import pickle
from abc import ABC, abstractmethod

import numpy as np

from ocl_tpu.data.non_stationary import construct_ns_multiple_wrapper
from ocl_tpu.data.task_compose import (
    create_task_composition,
    load_task_with_labels,
    shuffle_data,
)


def _to_float(x):
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    return x.astype(np.float32)


class DatasetBase(ABC):
    """Reference continuum/dataset_scripts/dataset_base.py:4-47."""

    def __init__(self, dataset, scenario, task_nums, params):
        self.params = params
        self.scenario = scenario
        self.dataset = dataset
        self.task_nums = task_nums
        self.root = os.path.join("./datasets", self.dataset)
        self.test_set = []
        self.val_set = []
        self.download_load()

    @abstractmethod
    def download_load(self):
        ...

    @abstractmethod
    def setup(self, **kwargs):
        ...

    @abstractmethod
    def new_task(self, cur_task, **kwargs):
        ...

    @abstractmethod
    def new_run(self, **kwargs):
        ...

    def get_test_set(self):
        return [(_to_float(x), np.asarray(y)) for x, y in self.test_set]

    def clean_mem_test_set(self):
        self.test_set = None
        self.test_data = None
        self.test_label = None


class _SplitClassDataset(DatasetBase):
    """Shared NC/NI logic for cifar10/cifar100/mini_imagenet-style datasets."""

    n_classes = 0
    img_size = 32

    def __init__(self, name, scenario, params):
        if scenario == "ni":
            num_tasks = len(params.ns_factor)
        else:
            num_tasks = params.num_tasks
        super().__init__(name, scenario, num_tasks, params)

    def setup(self):
        if self.scenario == "ni":
            self.train_set, self.val_set, self.test_set = construct_ns_multiple_wrapper(
                self.train_data, self.train_label, self.test_data, self.test_label,
                self.task_nums, self.img_size, self.params.val_size,
                self.params.ns_type, self.params.ns_factor,
                plot=bool(getattr(self.params, "plot_sample", False)))
        elif self.scenario == "nc":
            self.task_labels = create_task_composition(
                class_nums=self.n_classes, num_tasks=self.task_nums,
                fixed_order=self.params.fix_order, verbose=self.params.verbose)
            self.test_set = []
            for labels in self.task_labels:
                x_test, y_test = load_task_with_labels(self.test_data, self.test_label, labels)
                self.test_set.append((x_test, y_test))
        else:
            raise Exception("wrong scenario")

    def new_task(self, cur_task, **kwargs):
        if self.scenario == "ni":
            x_train, y_train = self.train_set[cur_task]
            labels = set(np.asarray(y_train).tolist())
        else:
            labels = self.task_labels[cur_task]
            x_train, y_train = load_task_with_labels(self.train_data, self.train_label, labels)
        return _to_float(x_train), np.asarray(y_train), labels

    def new_run(self, **kwargs):
        self.setup()
        return self.test_set


class CIFAR10(_SplitClassDataset):
    n_classes = 10
    img_size = 32

    def __init__(self, scenario, params):
        super().__init__("cifar10", scenario, params)

    def download_load(self):
        folder = os.path.join(self.root, "cifar-10-batches-py")
        xs, ys = [], []
        for i in range(1, 6):
            with open(os.path.join(folder, f"data_batch_{i}"), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys.extend(d[b"labels"])
        self.train_data = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.train_label = np.asarray(ys)
        with open(os.path.join(folder, "test_batch"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        self.test_data = np.asarray(d[b"data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.test_label = np.asarray(d[b"labels"])


class CIFAR100(_SplitClassDataset):
    n_classes = 100
    img_size = 32

    def __init__(self, scenario, params):
        super().__init__("cifar100", scenario, params)

    def download_load(self):
        folder = os.path.join(self.root, "cifar-100-python")
        with open(os.path.join(folder, "train"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        self.train_data = np.asarray(d[b"data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.train_label = np.asarray(d[b"fine_labels"])
        with open(os.path.join(folder, "test"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        self.test_data = np.asarray(d[b"data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.test_label = np.asarray(d[b"fine_labels"])


class Mini_ImageNet(_SplitClassDataset):
    """Reference continuum/dataset_scripts/mini_imagenet.py: re-splits the
    3 kaggle cache pickles' 100 classes x 600 images 5/6 train, 1/6 test."""

    n_classes = 100
    img_size = 84
    TEST_SPLIT = 1 / 6

    def __init__(self, scenario, params):
        super().__init__("mini_imagenet", scenario, params)

    def download_load(self):
        parts = []
        for split, n_cls in (("train", 64), ("val", 16), ("test", 20)):
            with open(os.path.join(self.root, f"mini-imagenet-cache-{split}.pkl"), "rb") as f:
                d = pickle.load(f)
            parts.append(d["image_data"].reshape([n_cls, 600, 84, 84, 3]))
        all_data = np.vstack(parts)
        tr_x, tr_y, te_x, te_y = [], [], [], []
        n_test = int(600 * self.TEST_SPLIT)
        for i in range(len(all_data)):
            rx, ry = shuffle_data(all_data[i], np.ones((600,)) * i)
            te_x.append(rx[:n_test]); te_y.append(ry[:n_test])
            tr_x.append(rx[n_test:]); tr_y.append(ry[n_test:])
        self.train_data = np.concatenate(tr_x)
        self.train_label = np.concatenate(tr_y).astype(np.int64)
        self.test_data = np.concatenate(te_x)
        self.test_label = np.concatenate(te_y).astype(np.int64)


CORE50_NTASK = {"ni": 8, "nc": 9, "nic": 79, "nicv2_79": 79,
                "nicv2_196": 196, "nicv2_391": 391}


class CORE50(DatasetBase):
    """Reference continuum/dataset_scripts/core50.py: paths.pkl/LUP.pkl/
    labels.pkl protocol, per-task on-demand jpg decode, <=10 runs."""

    def __init__(self, scenario, params):
        if isinstance(params.num_runs, int) and params.num_runs > 10:
            raise Exception("the max number of runs for CORE50 is 10")
        super().__init__("core50", scenario, CORE50_NTASK[scenario], params)

    def download_load(self):
        with open(os.path.join(self.root, "paths.pkl"), "rb") as f:
            self.paths = pickle.load(f)
        with open(os.path.join(self.root, "LUP.pkl"), "rb") as f:
            self.LUP = pickle.load(f)
        with open(os.path.join(self.root, "labels.pkl"), "rb") as f:
            self.labels = pickle.load(f)

    def _load_imgs(self, idx_list):
        rel_paths = [self.paths[idx] for idx in idx_list]
        # md5-keyed decoded-array cache (reference core50.py:100-158
        # get_batch_from_paths; there it ships behind on_the_fly=True and is
        # never hit — here it is on by default so repeat runs skip JPEG
        # decode entirely; --core50_cache False disables it)
        cache_file = None
        if getattr(self.params, "core50_cache", True):
            from hashlib import md5

            digest = md5("".join(rel_paths).encode("utf-8")).hexdigest()
            cache_dir = os.path.join(self.root, "bin_cache")
            cache_file = os.path.join(cache_dir, digest + "_x.bin")
            if os.path.exists(cache_file):
                return np.fromfile(cache_file, dtype=np.uint8).reshape(
                    len(rel_paths), 128, 128, 3)
        paths = [os.path.join(self.root, p) for p in rel_paths]
        # native multithreaded decode (csrc/dataio.cpp); PIL fallback
        from ocl_tpu.data.native_io import decode_jpeg_batch

        x = decode_jpeg_batch(paths, 128, 128)
        if x is None:
            from PIL import Image

            x = np.zeros((len(paths), 128, 128, 3), dtype=np.uint8)
            for i, p in enumerate(paths):
                x[i] = np.array(Image.open(p).convert("RGB").resize((128, 128)))
        if cache_file is not None:
            os.makedirs(os.path.dirname(cache_file), exist_ok=True)
            x.tofile(cache_file)
        return x

    def setup(self, cur_run):
        self.val_set, self.test_set = [], []
        test_idx = self.LUP[self.scenario][cur_run][-1]
        self.test_data = self._load_imgs(test_idx)
        self.test_label = np.asarray(self.labels[self.scenario][cur_run][-1])
        if self.scenario == "nc":
            self.task_labels = self.labels[self.scenario][cur_run][:-1]
            for labels in self.task_labels:
                labels = list(set(labels))
                self.test_set.append(load_task_with_labels(self.test_data, self.test_label, labels))
        else:
            self.test_set = [(self.test_data, self.test_label)]

    def new_task(self, cur_task, **kwargs):
        cur_run = kwargs["cur_run"]
        train_idx = self.LUP[self.scenario][cur_run][cur_task]
        train_x = self._load_imgs(train_idx)
        train_y = np.asarray(self.labels[self.scenario][cur_run][cur_task])
        train_x, train_y = shuffle_data(train_x, train_y)
        n_val = int(len(train_x) * self.params.val_size)
        self.val_set.append((train_x[:n_val], train_y[:n_val]))
        x, y = train_x[n_val:], train_y[n_val:]
        return _to_float(x), y, set(y.tolist())

    def new_run(self, **kwargs):
        self.setup(kwargs["cur_run"])


OPENLORIS_NTASK = {"illumination": 9, "occlusion": 9, "pixel": 9,
                   "clutter": 9, "sequence": 12}


class OpenLORIS(DatasetBase):
    """Reference continuum/dataset_scripts/openloris.py: per-factor jpg tree,
    121 object classes resized to 50x50."""

    def __init__(self, scenario, params):
        self.ns_type = params.ns_type
        super().__init__("openloris", scenario, OPENLORIS_NTASK[params.ns_type], params)

    def download_load(self):
        from PIL import Image

        from ocl_tpu.data.openloris_objects import DATAPATH

        self.train_set = []
        for batch_num in range(1, self.task_nums + 1):
            train_x, train_y, test_x, test_y = [], [], [], []
            for i, obj in enumerate(DATAPATH):
                for split, xs, ys in (("train", train_x, train_y), ("test", test_x, test_y)):
                    files = glob.glob(os.path.join(
                        "datasets/openloris", self.ns_type, split,
                        f"task{batch_num}", obj, "*.jpg"))
                    xs.extend(np.array(Image.open(p).convert("RGB").resize((50, 50)))
                              for p in files)
                    ys.extend([i] * len(files))
            self.train_set.append((np.array(train_x), np.array(train_y)))
            self.test_set.append((np.array(test_x), np.array(test_y)))

    def new_task(self, cur_task, **kwargs):
        train_x, train_y = self.train_set[cur_task]
        train_x, train_y = shuffle_data(train_x, train_y)
        n_val = int(len(train_x) * self.params.val_size)
        self.val_set.append((train_x[:n_val], train_y[:n_val]))
        x, y = train_x[n_val:], train_y[n_val:]
        return _to_float(x), y, set(y.tolist())

    def new_run(self, **kwargs):
        pass

    def setup(self, **kwargs):
        pass


class Synthetic(_SplitClassDataset):
    """Deterministic class-clustered Gaussian image stream (no files needed).

    Each class c has a fixed random template image; samples are
    0.5 + scale*(template-0.5) + N(0, noise). Learnable by a convnet,
    streams/evaluates exactly like cifar10 under both NC and NI protocols.
    `synthetic_difficulty` (0..1, default 0) shrinks class separation and
    raises noise so continual-learning dynamics (forgetting, replay gains)
    become visible.
    """

    n_classes = 10
    img_size = 32

    def __init__(self, scenario, params):
        self.n_classes = getattr(params, "synthetic_classes", 10)
        self.per_class = getattr(params, "synthetic_size", 2000)
        self.difficulty = float(getattr(params, "synthetic_difficulty", 0.0))
        super().__init__("synthetic", scenario, params)

    def download_load(self):
        gen = np.random.RandomState(1234)
        templates = gen.rand(self.n_classes, self.img_size, self.img_size, 3)
        scale = 1.0 - 0.85 * self.difficulty    # class separation
        noise = 0.15 + 0.25 * self.difficulty   # per-sample noise

        def make(n_per_class, seed):
            g = np.random.RandomState(seed)
            xs, ys = [], []
            for c in range(self.n_classes):
                base = 0.5 + scale * (templates[c] - 0.5)
                x = base + g.normal(0, noise,
                                    (n_per_class, self.img_size, self.img_size, 3))
                xs.append(np.clip(x, 0, 1))
                ys.append(np.full(n_per_class, c))
            x = np.concatenate(xs).astype(np.float32)
            return (np.clip(x * 255, 0, 255)).astype(np.uint8), np.concatenate(ys)

        self.train_data, self.train_label = make(self.per_class, 1)
        self.test_data, self.test_label = make(max(self.per_class // 5, 50), 2)
