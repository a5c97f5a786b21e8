"""Test-side import shims that let the REFERENCE pipeline run unmodified in
this environment (no kornia/skimage wheels, no CUDA).  Everything here is a
fresh implementation written against documented library semantics — no
reference code and no kornia/skimage code is copied.

Shims installed by install_all():
  * kornia / kornia.filters / kornia.filters.sobel
      `spatial_gradient` + `sobel` (only symbols the reference imports,
      model/loss.py:3) implemented with plain torch conv2d: 3x3 sobel
      kernels normalized by L1 mass (/8), replicate padding — the same
      semantics our JAX ops/gradient.py implements and parity-tests.
  * skimage / skimage.io / skimage.measure
      `io.imread` backed by PIL (reference only calls it with
      as_gray=False, e.g. data_loader/event_dataset.py:223);
      `measure.compare_ssim` import-satisfying stub (imported by
      model/metric.py:2, never called by test.py/evaluation.py).
  * trainer.trainer_no_recurrent
      Missing module upstream — reference train.py:12 imports it but the
      repo only ships trainer/{trainer,lstm_trainer}.py, so train.py (and
      test.py, which imports `from train import concatenate_subfolders`)
      crashes at import time as shipped.  A stub class satisfies the import.
  * torch.Tensor.to / torch.nn.Module.to wrapped to map cuda -> cpu
      (reference hardcodes cuda devices, model/model.py:77, test.py:184).
"""
from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference/RAM_Net"


def _install_kornia():
    if "kornia" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    def _sobel_kernels(dtype, device):
        kx = torch.tensor([[-1.0, 0.0, 1.0],
                           [-2.0, 0.0, 2.0],
                           [-1.0, 0.0, 1.0]], dtype=dtype, device=device) / 8.0
        return kx, kx.t()

    def spatial_gradient(input, mode="sobel", order=1, normalized=True):
        """kornia.filters.spatial_gradient for the configuration the
        reference uses (sobel, order 1, normalized): [B,C,H,W] ->
        [B,C,2,H,W] with (dx, dy) along dim 2, replicate padding."""
        assert mode == "sobel" and order == 1, "shim covers reference usage only"
        b, c, h, w = input.shape
        kx, ky = _sobel_kernels(input.dtype, input.device)
        if not normalized:
            kx, ky = kx * 8.0, ky * 8.0
        kern = torch.stack([kx, ky]).unsqueeze(1)            # [2,1,3,3]
        kern = kern.repeat(c, 1, 1, 1)                       # [2c,1,3,3]
        padded = F.pad(input, (1, 1, 1, 1), mode="replicate")
        out = F.conv2d(padded, kern, groups=c)               # [B,2c,H,W]
        return out.view(b, c, 2, h, w)

    def sobel(input, normalized=True, eps=1e-6):
        g = spatial_gradient(input, normalized=normalized)
        gx, gy = g[:, :, 0], g[:, :, 1]
        return torch.sqrt(gx * gx + gy * gy + eps)

    kornia = types.ModuleType("kornia")
    filters = types.ModuleType("kornia.filters")
    sobel_mod = types.ModuleType("kornia.filters.sobel")
    sobel_mod.spatial_gradient = spatial_gradient
    sobel_mod.sobel = sobel
    filters.sobel = sobel_mod
    filters.spatial_gradient = spatial_gradient
    kornia.filters = filters
    sys.modules["kornia"] = kornia
    sys.modules["kornia.filters"] = filters
    sys.modules["kornia.filters.sobel"] = sobel_mod


def _install_skimage():
    if "skimage" in sys.modules:
        return
    import numpy as np

    def imread(path, as_gray=False):
        from PIL import Image
        img = np.asarray(Image.open(path))
        if as_gray:
            raise NotImplementedError(
                "shim covers the reference's as_gray=False call sites only")
        return img

    def compare_ssim(*a, **kw):  # imported by model/metric.py:2, never called
        raise NotImplementedError("compare_ssim shim is import-satisfying only")

    skimage = types.ModuleType("skimage")
    io_mod = types.ModuleType("skimage.io")
    io_mod.imread = imread
    measure_mod = types.ModuleType("skimage.measure")
    measure_mod.compare_ssim = compare_ssim
    skimage.io = io_mod
    skimage.measure = measure_mod
    sys.modules["skimage"] = skimage
    sys.modules["skimage.io"] = io_mod
    sys.modules["skimage.measure"] = measure_mod


def _install_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    utils_mod = types.ModuleType("torchvision.utils")

    def _unused(*a, **kw):  # trainer/trainer.py:4 imports, test paths never call
        raise NotImplementedError("torchvision shim is import-satisfying only")

    utils_mod.make_grid = _unused
    utils_mod.save_image = _unused
    tv.utils = utils_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = utils_mod


def _install_trainer_no_recurrent():
    name = "trainer.trainer_no_recurrent"
    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    class TrainerNoRecurrent:  # never instantiated by test.py paths
        def __init__(self, *a, **kw):
            raise NotImplementedError("stub for a module missing upstream")

    mod.TrainerNoRecurrent = TrainerNoRecurrent
    sys.modules[name] = mod


def _patch_torch_cuda_to_cpu():
    import torch
    if getattr(torch, "_ramnet_cpu_patch", False):
        return
    torch._ramnet_cpu_patch = True

    def _map(a):
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        return a

    orig_tensor_to = torch.Tensor.to

    def tensor_to(self, *args, **kwargs):
        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return orig_tensor_to(self, *args, **kwargs)

    torch.Tensor.to = tensor_to

    orig_module_to = torch.nn.Module.to

    def module_to(self, *args, **kwargs):
        args = tuple(_map(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _map(kwargs["device"])
        return orig_module_to(self, *args, **kwargs)

    torch.nn.Module.to = module_to


def _patch_numpy_legacy_aliases():
    """The reference targets numpy<2 (requirements.txt); restore the removed
    aliases it uses (np.alltrue: event_dataset.py:54, dataset.py:218;
    np.int: event_tensor_utils.py:26,97-102, dataset_asynchronous.py:278-283)."""
    import numpy as np
    if not hasattr(np, "alltrue"):
        np.alltrue = np.all
    if not hasattr(np, "sometrue"):
        np.sometrue = np.any
    if not hasattr(np, "int"):
        np.int = int
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "bool"):
        np.bool = bool


def install_all():
    """Install every shim and put the reference package on sys.path."""
    import matplotlib
    matplotlib.use("Agg")  # test.py plt.show() preview blocks (test.py:236-254)
    _patch_numpy_legacy_aliases()
    _install_kornia()
    _install_skimage()
    _install_torchvision()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_trainer_no_recurrent()
    _patch_torch_cuda_to_cpu()
