"""Run the actual /root/reference (PyTorch) agents on an in-memory stream.

This is the accuracy-parity oracle: it imports the reference's own agent,
buffer, and evaluation code (reference: agents/*.py, utils/buffer/*.py,
agents/base.py:118-180) unmodified, feeds it a synthetic class-incremental
stream as raw numpy arrays (bypassing torchvision downloads — no datasets or
network exist on this host), and returns the per-task accuracy matrix in the
same (tasks_seen, tasks) layout the reference's experiment/run.py collects.

tools/parity_vs_reference.py drives this side-by-side with ocl_tpu and writes
PARITY_RESULTS.md; tests/test_reference_parity.py pins the cheapest
comparisons in CI.

The reference imports torchvision / kornia / skimage at module level; none are
installed here, so minimal functional stubs are registered first:
- torchvision.transforms.ToTensor/Compose with real torchvision semantics
  (uint8 HWC -> float CHW /255) — the only pieces the in-memory path executes;
- kornia.augmentation {RandomResizedCrop, RandomHorizontalFlip, ColorJitter,
  RandomGrayscale} as per-sample-random torch modules with kornia's BCHW
  batch semantics (reference: agents/scr.py:18-24) so SCR runs for real;
- skimage.filters.gaussian via scipy.ndimage (only NI streams touch it).
"""

from __future__ import annotations

import random
import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


# --------------------------------------------------------------------- stubs

def _install_torchvision_stub():
    import torch

    tv = types.ModuleType("torchvision")
    tfm = types.ModuleType("torchvision.transforms")
    ds = types.ModuleType("torchvision.datasets")

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if arr.dtype == np.uint8:
                return t.float().div(255.0)
            return t.float()

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    tfm.ToTensor, tfm.Compose = ToTensor, Compose
    tv.transforms, tv.datasets = tfm, ds
    sys.modules.update({
        "torchvision": tv,
        "torchvision.transforms": tfm,
        "torchvision.datasets": ds,
    })


def _install_kornia_stub():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class _Aug(nn.Module):
        def __init__(self, p=1.0):
            super().__init__()
            self.p = p

        def _mask(self, n, device):
            return torch.rand(n, device=device) < self.p

    class RandomHorizontalFlip(_Aug):
        def __init__(self, p=0.5):
            super().__init__(p)

        def forward(self, x):
            sel = self._mask(x.shape[0], x.device)
            out = x.clone()
            out[sel] = torch.flip(x[sel], dims=[-1])
            return out

    class RandomResizedCrop(_Aug):
        def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3), p=1.0):
            super().__init__(p)
            self.size, self.scale, self.ratio = size, scale, ratio

        def forward(self, x):
            n, _c, h, w = x.shape
            outs = []
            for i in range(n):
                for _ in range(10):
                    area = h * w * float(torch.empty(1).uniform_(*self.scale))
                    log_r = torch.empty(1).uniform_(
                        np.log(self.ratio[0]), np.log(self.ratio[1]))
                    ratio = float(torch.exp(log_r))
                    cw = int(round(np.sqrt(area * ratio)))
                    ch = int(round(np.sqrt(area / ratio)))
                    if 0 < cw <= w and 0 < ch <= h:
                        top = int(torch.randint(0, h - ch + 1, (1,)))
                        left = int(torch.randint(0, w - cw + 1, (1,)))
                        break
                else:
                    ch, cw, top, left = h, w, 0, 0
                crop = x[i : i + 1, :, top : top + ch, left : left + cw]
                outs.append(F.interpolate(crop, size=self.size, mode="bilinear",
                                          align_corners=False))
            return torch.cat(outs, dim=0)

    def _rgb_to_gray(x):
        r, g, b = x[:, 0:1], x[:, 1:2], x[:, 2:3]
        return 0.299 * r + 0.587 * g + 0.114 * b

    class RandomGrayscale(_Aug):
        def __init__(self, p=0.1):
            super().__init__(p)

        def forward(self, x):
            sel = self._mask(x.shape[0], x.device)
            out = x.clone()
            gray = _rgb_to_gray(x[sel]).repeat(1, x.shape[1], 1, 1)
            out[sel] = gray
            return out

    class ColorJitter(_Aug):
        def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0,
                     hue=0.0, p=1.0):
            super().__init__(p)
            self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue

        def _op_b(self, img):
            return (img * float(torch.empty(1).uniform_(
                max(0.0, 1 - self.b), 1 + self.b))).clamp(0, 1)

        def _op_c(self, img):
            f = float(torch.empty(1).uniform_(
                max(0.0, 1 - self.c), 1 + self.c))
            return (f * img + (1 - f) * _rgb_to_gray(img).mean(
                dim=(-1, -2), keepdim=True)).clamp(0, 1)

        def _op_s(self, img):
            f = float(torch.empty(1).uniform_(
                max(0.0, 1 - self.s), 1 + self.s))
            return (f * img + (1 - f) * _rgb_to_gray(img).repeat(
                1, 3, 1, 1)).clamp(0, 1)

        def _op_h(self, img):
            # cheap hue rotation: roll channels by a blend factor
            f = float(torch.empty(1).uniform_(-self.h, self.h))
            rolled = torch.roll(img, shifts=1, dims=1)
            return ((1 - abs(f)) * img + abs(f) * rolled).clamp(0, 1)

        def forward(self, x):
            n = x.shape[0]
            sel = self._mask(n, x.device)
            out = x.clone()
            # kornia shuffles the sub-op order once per call
            ops = [op for flag, op in ((self.b, self._op_b), (self.c, self._op_c),
                                       (self.s, self._op_s), (self.h, self._op_h))
                   if flag]
            order = torch.randperm(len(ops)).tolist()
            for i in range(n):
                if not bool(sel[i]):
                    continue
                img = x[i : i + 1]
                for j in order:
                    img = ops[j](img)
                out[i] = img[0]
            return out

    kornia = types.ModuleType("kornia")
    aug = types.ModuleType("kornia.augmentation")
    aug.RandomResizedCrop = RandomResizedCrop
    aug.RandomHorizontalFlip = RandomHorizontalFlip
    aug.ColorJitter = ColorJitter
    aug.RandomGrayscale = RandomGrayscale
    kornia.augmentation = aug
    sys.modules.update({"kornia": kornia, "kornia.augmentation": aug})


def _install_skimage_stub():
    from scipy import ndimage

    skimage = types.ModuleType("skimage")
    filters = types.ModuleType("skimage.filters")

    def gaussian(image, sigma=1.0, **kwargs):
        multichannel = kwargs.get("multichannel", kwargs.get("channel_axis") is not None)
        img = np.asarray(image, dtype=np.float64)
        if img.max() > 1.0:
            img = img / 255.0
        sig = [sigma] * img.ndim
        if multichannel:
            sig[-1] = 0  # don't blur across channels
        return ndimage.gaussian_filter(img, sigma=sig)

    filters.gaussian = gaussian
    skimage.filters = filters
    sys.modules.update({"skimage": skimage, "skimage.filters": filters})


_READY = False


def ensure_reference_importable(reference_dir=REFERENCE_DIR):
    global _READY
    if _READY:
        return
    if "torchvision" not in sys.modules:
        _install_torchvision_stub()
    if "kornia" not in sys.modules:
        _install_kornia_stub()
    if "skimage" not in sys.modules:
        _install_skimage_stub()
    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    _READY = True


# ------------------------------------------------------------------- running

def _narrow_model(params, nf):
    """The reference architecture at reduced width (CI only; its
    setup_architecture hard-codes nf=20, reference models/resnet.py:112)."""
    from models.resnet import Reduced_ResNet18, SupConResNet
    import torch.nn as nn

    n_cls = {"cifar10": 10, "cifar100": 100, "mini_imagenet": 100}[params.data]
    if params.agent in ("SCR", "SCP"):
        model = SupConResNet(dim_in=nf * 8, head=params.head)
        model.encoder = Reduced_ResNet18(n_cls, nf=nf)
        return model
    return Reduced_ResNet18(n_cls, nf=nf)


def run_reference(params, tasks, test_sets, seed=0):
    """Train the reference agent on `tasks` and return the accuracy matrix.

    tasks: list of (x_uint8 NHWC, y int64) per task (train split)
    test_sets: list of (x_uint8 NHWC, y int64) per task
    Returns np.ndarray of shape (n_tasks, n_tasks): row i = accuracies on all
    test tasks after training task i (reference experiment/run.py:46-52).
    """
    ensure_reference_importable()
    import torch

    np.random.seed(seed)
    random.seed(seed)
    torch.manual_seed(seed)

    from continuum.data_utils import setup_test_loader
    from utils.name_match import agents
    from utils.setup_elements import setup_architecture, setup_opt
    from utils.utils import maybe_cuda

    nf = getattr(params, "nf", 20)
    if params.agent == "CNDPM":
        # CN-DPM's architecture is its own VAE/classifier mixture — nf is a
        # ResNet width knob and must not swap in a narrow ResNet here (the
        # Cndpm agent drives model.learn)
        model = setup_architecture(params)
    elif nf != 20:
        model = _narrow_model(params, nf)
        # GDumb re-inits its model through setup_architecture at every task
        # end (reference agents/gdumb.py:61) — keep the reinit at the same
        # narrow width or the comparison silently runs at nf=20.
        import agents.gdumb as _gdumb

        _gdumb.setup_architecture = lambda p: _narrow_model(p, nf)
    else:
        model = setup_architecture(params)
    model = maybe_cuda(model, params.cuda)
    opt = setup_opt(params.optimizer, model, params.learning_rate,
                    params.weight_decay)
    agent = agents[params.agent](model, opt, params)

    test_loaders = setup_test_loader(
        [(x, np.asarray(y)) for x, y in test_sets], params)

    rows = []
    for x_train, y_train in tasks:
        agent.train_learner(np.asarray(x_train), np.asarray(y_train))
        rows.append(np.asarray(agent.evaluate(test_loaders)))
    return np.stack(rows)
