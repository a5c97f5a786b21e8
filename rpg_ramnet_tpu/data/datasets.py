"""Host-side dataset layer: on-disk sequence folders -> fixed-shape numpy
datapackages ready for device upload.

Capability reference: RAM_Net/data_loader/event_dataset.py (VoxelGridDataset,
RawEventsDataset, FrameDataset), RAM_Net/data_loader/dataset.py
(SynchronizedFramesEventsDataset:144, SequenceSynchronizedFramesEventsDataset:23)
and RAM_Net/data_loader/dataset_asynchronous.py (raw-event accumulation for
the non-recurrent baseline).

TPU-first differences from the reference:
  * a datapackage is a dict of stacked fixed-shape NHWC arrays
    ('events' [K,H,W,C], 'image' [H,W,C], 'depth_events' [K,H,W,1],
    'depth_image' [H,W,1], optional 'times_*'), not K+1 separate CHW
    tensors — ready for lax.scan and batched device_put;
  * file indices are resolved once at init (single directory scan) instead
    of per-item glob;
  * randomness is explicit (seed-keyed numpy Generators), no global state.

On-disk formats supported (same as reference):
  EventScape:  <prefix>_%04d_voxel.npy / _events.npy / _depth.npy /
               _image.png / _gt_labelIds.png, with timestamps.txt
  MVSEC:       event_tensor_%010d.npy, depth_%010d.npy, frame_%010d.png
               ("mvsec" in the base folder path activates these,
               event_dataset.py:28-31)
"""
from __future__ import annotations

import os
import re
from os.path import join
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..ops.depth import depth_to_log_np, rgb_to_gray_np
from ..ops.voxel import normalize_voxel_grid_np
from ..core.registry import DATASETS
from .timestamps import TimestampIndex, first_element_greater_than, is_mvsec_folder


# ---------------------------------------------------------------------------
# file indexing
# ---------------------------------------------------------------------------

_PATTERNS = {
    "voxel_es": re.compile(r"_(\d{4})_voxel\.npy$"),
    "voxel_mvsec": re.compile(r"^event_tensor_(\d{10})\.npy$"),
    "events_es": re.compile(r"_(\d{4})_events\.npy$"),
    "depth_es": re.compile(r"_(\d{4})_depth\.npy$"),
    "depth_mvsec": re.compile(r"^depth_(\d{10})\.npy$"),
    "image_es": re.compile(r"_(\d{4})_image\.png$"),
    "image_mvsec": re.compile(r"^frame_(\d{10})\.png$"),
    "semantic_es": re.compile(r"_(\d{4})_gt_labelIds\.png$"),
}


def index_files(folder: str, kind: str, mvsec: bool) -> Dict[int, str]:
    """One directory scan -> {frame index: path}."""
    key = {
        "voxel": "voxel_mvsec" if mvsec else "voxel_es",
        "events": "events_es",
        "depth": "depth_mvsec" if mvsec else "depth_es",
        "image": "image_mvsec" if mvsec else "image_es",
        "semantic": "semantic_es",
    }[kind]
    pat = _PATTERNS[key]
    out: Dict[int, str] = {}
    if not os.path.isdir(folder):
        return out
    for name in os.listdir(folder):
        m = pat.search(name)
        if m:
            out[int(m.group(1))] = join(folder, name)
    return out


def _read_image(path: str) -> np.ndarray:
    """RGB float32 [H, W, 3] (or [H, W] for grayscale pngs)."""
    from PIL import Image
    img = np.asarray(Image.open(path)).astype(np.float32)
    return img


def _apply_transform(x: np.ndarray, transform, seed: Optional[int],
                     is_flow: bool = False) -> np.ndarray:
    """Fresh rng per tensor from the shared seed — every tensor of a
    sequence sees the same crop/flip draws (the reference re-seeds python's
    global rng before each transform call, dataset.py:313-315)."""
    if transform is None:
        return x
    rng = np.random.RandomState(seed if seed is not None else np.random.randint(2 ** 31))
    return transform(x, rng, is_flow)


# ---------------------------------------------------------------------------
# primitive stream datasets
# ---------------------------------------------------------------------------


class VoxelGridDataset:
    """Precomputed voxel grids (event_dataset.py:113-160).  Returns
    [H, W, num_bins] float32, optionally nonzero-mean/std normalized."""

    def __init__(self, base_folder: str, event_folder: str, start_time: float = 0.0,
                 stop_time: float = 0.0, transform=None, normalize: bool = True):
        self.base_folder = base_folder
        self.event_folder = join(base_folder, event_folder)
        self.transform = transform
        self.normalize = normalize
        self.use_mvsec = is_mvsec_folder(base_folder)
        self.index = TimestampIndex.load(self.event_folder, start_time, stop_time,
                                         mvsec_drop_last=self.use_mvsec)
        self.files = index_files(self.event_folder, "voxel", self.use_mvsec)
        self.num_bins: Optional[int] = None

    def __len__(self) -> int:
        return self.index.length

    def get_stamp_at(self, i: int) -> float:
        return self.index.stamp_at(i)

    @property
    def initial_stamp(self) -> float:
        return self.index.initial_stamp

    def __getitem__(self, i: int, seed: Optional[int] = None) -> np.ndarray:
        assert 0 <= i < len(self)
        grid = np.load(self.files[self.index.index_at(i)]).astype(np.float32)
        if self.normalize:
            grid = normalize_voxel_grid_np(grid)
        self.num_bins = grid.shape[0]
        grid = np.moveaxis(grid, 0, -1)  # CHW -> HWC
        return _apply_transform(grid, self.transform, seed)


class RawEventsDataset:
    """Raw [t, x, y, pol] event windows (event_dataset.py:162-189)."""

    def __init__(self, base_folder: str, event_folder: str, start_time: float = 0.0,
                 stop_time: float = 0.0):
        self.base_folder = base_folder
        self.event_folder = join(base_folder, event_folder)
        self.use_mvsec = is_mvsec_folder(base_folder)
        self.index = TimestampIndex.load(self.event_folder, start_time, stop_time,
                                         mvsec_drop_last=self.use_mvsec)
        self.files = index_files(self.event_folder, "events", self.use_mvsec)

    def __len__(self) -> int:
        return self.index.length

    def get_stamp_at(self, i: int) -> float:
        return self.index.stamp_at(i)

    @property
    def initial_stamp(self) -> float:
        return self.index.initial_stamp

    def __getitem__(self, i: int) -> np.ndarray:
        assert 0 <= i < len(self)
        return np.load(self.files[self.index.index_at(i)])


class FrameDataset:
    """Grayscale-converted RGB frames (event_dataset.py:192-238).
    Returns [H, W, 1] float32 in [0, 1]."""

    def __init__(self, base_folder: str, frame_folder: str, start_time: float = 0.0,
                 stop_time: float = 0.0, transform=None, normalize: bool = True):
        self.base_folder = base_folder
        self.frame_folder = join(base_folder, frame_folder)
        self.transform = transform
        self.normalize = normalize
        self.use_mvsec = is_mvsec_folder(base_folder)
        self.index = TimestampIndex.load(self.frame_folder, start_time, stop_time,
                                         mvsec_drop_last=self.use_mvsec)
        self.files = index_files(self.frame_folder, "image", self.use_mvsec)

    def __len__(self) -> int:
        return self.index.length

    def __getitem__(self, i: int, seed: Optional[int] = None) -> np.ndarray:
        assert 0 <= i < len(self)
        rgb = _read_image(self.files[self.index.index_at(i)])
        gray = rgb_to_gray_np(rgb) if rgb.ndim == 3 else rgb
        if self.normalize:
            gray = gray / 255.0
        gray = gray[..., None]
        return _apply_transform(gray, self.transform, seed)


# ---------------------------------------------------------------------------
# synchronized event<->depth<->frame packaging
# ---------------------------------------------------------------------------


class SynchronizedFramesEventsDataset:
    """One datapackage per index: K event voxel steps + 1 frame, each with
    its log-depth ground truth (dataset.py:144-416 semantics, incl. baseline
    packing variants)."""

    def __init__(self, base_folder: str, event_folder: str,
                 depth_folder: str = "frames", frame_folder: str = "rgb",
                 flow_folder: str = "flow", semantic_folder: str = "semantic",
                 start_time: float = 0.0, stop_time: float = 0.0,
                 clip_distance: float = 100.0, every_x_rgb_frame: int = 1,
                 transform=None, normalize: bool = True,
                 use_phased_arch: bool = False,
                 baseline: Union[bool, str] = False,
                 loss_composition=False, reg_factor: float = 5.7,
                 load_semantic: bool = False):
        self.base_folder = base_folder
        self.depth_folder = join(base_folder, depth_folder or "frames")
        self.frame_folder = join(base_folder, frame_folder or "rgb")
        self.semantic_folder = join(base_folder, semantic_folder or "semantic")
        self.transform = transform
        self.clip_distance = clip_distance
        self.every_x_rgb_frame = every_x_rgb_frame
        self.baseline = baseline
        self.loss_composition = loss_composition
        self.reg_factor = reg_factor
        self.use_phased_arch = use_phased_arch
        self.load_semantic = load_semantic
        self.use_mvsec = is_mvsec_folder(base_folder)

        self.event_dataset = VoxelGridDataset(base_folder, event_folder,
                                              start_time, stop_time,
                                              transform=transform,
                                              normalize=normalize)
        # depth stamp table, offset by the event stream's initial stamp
        stamps = np.loadtxt(join(self.depth_folder, "timestamps.txt"))[:, 1]
        if self.use_mvsec:
            stamps = stamps[1:]  # dataset.py:208-209
        self.depth_stamps = stamps - self.event_dataset.initial_stamp
        if not np.all(np.diff(self.depth_stamps) > 0):
            raise ValueError("frame timestamps are not unique and monotonically increasing")
        self.depth_files = index_files(self.depth_folder, "depth", self.use_mvsec)
        self.frame_files = index_files(self.frame_folder, "image", self.use_mvsec)
        self.semantic_files = index_files(self.semantic_folder, "semantic", self.use_mvsec)

        # number of raw event steps (NOT packages), mirroring reference .length
        self.length = len(self.event_dataset)

    def __len__(self) -> int:
        return self.length

    def num_packages(self) -> int:
        return self.length // self.every_x_rgb_frame

    def _frame_idx_for_stamp(self, stamp: float) -> int:
        idx, f_stamp = first_element_greater_than(self.depth_stamps, stamp)
        assert 0 <= idx < len(self.depth_stamps)
        assert f_stamp - stamp < 1e-5, (f_stamp, stamp)
        return idx

    def _load_depth(self, frame_idx: int) -> np.ndarray:
        d = np.load(self.depth_files[frame_idx]).astype(np.float32)
        d = depth_to_log_np(d, self.clip_distance, self.reg_factor)
        if d.ndim == 2:
            d = d[..., None]
        return d

    def _load_gray(self, frame_idx: int) -> Optional[np.ndarray]:
        path = self.frame_files.get(frame_idx)
        if path is None:
            return None
        rgb = _read_image(path)
        gray = rgb_to_gray_np(rgb) if rgb.ndim == 3 else rgb
        gray = (gray / 255.0)[..., None]
        return gray

    def _load_semantic(self, frame_idx: int) -> Optional[np.ndarray]:
        path = self.semantic_files.get(frame_idx)
        if path is None:
            return None
        img = _read_image(path)
        if img.ndim == 3:
            img = img[..., 0]
        return img[..., None]

    def __getitem__(self, i: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        assert 0 <= i < self.num_packages()
        if seed is None:
            seed = int(np.random.randint(0, 2 ** 31))
        K = self.every_x_rgb_frame
        baseline = self.baseline

        events_list: List[np.ndarray] = []
        depth_events_list: List[np.ndarray] = []
        times_events: List[float] = []
        semantic_list: List[np.ndarray] = []
        item: Dict[str, Any] = {}
        last_gray_frame = None

        for k in range(K):
            j = i * K + k
            stamp = self.event_dataset.get_stamp_at(j)
            frame_idx = self._frame_idx_for_stamp(stamp)

            voxel = None
            if baseline != "rgb":
                voxel = self.event_dataset.__getitem__(j, seed)

            depth = _apply_transform(self._load_depth(frame_idx), self.transform, seed)

            is_event_slot = (not bool(baseline)) or (
                baseline == "e" and self.loss_composition == "image" and k < K - 1)
            if is_event_slot:
                events_list.append(voxel)
                depth_events_list.append(depth)
                times_events.append(stamp)
                if self.load_semantic:
                    sem = self._load_semantic(frame_idx)
                    if sem is not None:
                        semantic_list.append(_apply_transform(sem, self.transform, seed))

            if baseline == "ergb0" and k < K - 1:
                if k == 0:
                    if frame_idx < K:
                        last_gray_frame = np.zeros_like(depth)
                    else:
                        g = self._load_gray(frame_idx - (k + 1))
                        last_gray_frame = _apply_transform(g, self.transform, seed)
                events_list.append(np.concatenate([voxel, last_gray_frame], axis=-1))
                depth_events_list.append(depth)
                times_events.append(stamp)

            if k == K - 1:
                gray = self._load_gray(frame_idx)
                if gray is not None:
                    gray = _apply_transform(gray, self.transform, seed)
                if (not bool(baseline)) or baseline == "rgb":
                    item["image"] = gray
                elif baseline in ("ergb", "ergb0"):
                    item["image"] = np.concatenate([voxel, gray], axis=-1)
                elif baseline == "e":
                    item["image"] = voxel
                item["depth_image"] = depth
                if self.use_phased_arch:
                    item["times_image"] = np.float32(stamp)
                if self.load_semantic:
                    sem = self._load_semantic(frame_idx)
                    if sem is not None:
                        item["semantic_image"] = _apply_transform(sem, self.transform, seed)

        if events_list:
            item["events"] = np.stack(events_list)          # [K', H, W, C]
            item["depth_events"] = np.stack(depth_events_list)
            if self.use_phased_arch:
                item["times_events"] = np.asarray(times_events, np.float32)
            if self.load_semantic and semantic_list:
                item["semantic_events"] = np.stack(semantic_list)
        else:
            h, w, _ = item["depth_image"].shape
            item["events"] = np.zeros((0, h, w, 0), np.float32)
            item["depth_events"] = np.zeros((0, h, w, 1), np.float32)
        return item


class SynchronizedFramesEventsRawDataset:
    """Non-recurrent variant: accumulates raw events across the K sub-steps
    of a package, voxelizes them in ONE grid and concatenates the gray frame
    (dataset_asynchronous.py:21-308).  Feeds ERGB2Depth."""

    def __init__(self, base_folder: str, event_folder: str,
                 depth_folder: str = "frames", frame_folder: str = "rgb",
                 flow_folder: str = "flow", semantic_folder: str = "semantic",
                 start_time: float = 0.0, stop_time: float = 0.0,
                 clip_distance: float = 100.0, every_x_rgb_frame: int = 1,
                 transform=None, normalize: bool = True,
                 use_phased_arch: bool = False, baseline: Union[bool, str] = False,
                 loss_composition=False, reg_factor: float = 5.7,
                 num_bins: int = 5):
        self.base_folder = base_folder
        self.depth_folder = join(base_folder, depth_folder or "frames")
        self.frame_folder = join(base_folder, frame_folder or "rgb")
        self.transform = transform
        self.normalize = normalize
        self.clip_distance = clip_distance
        self.every_x_rgb_frame = every_x_rgb_frame
        self.reg_factor = reg_factor
        self.use_phased_arch = use_phased_arch
        self.num_bins = num_bins
        self.use_mvsec = is_mvsec_folder(base_folder)

        self.event_dataset = RawEventsDataset(base_folder, event_folder,
                                              start_time, stop_time)
        stamps = np.loadtxt(join(self.depth_folder, "timestamps.txt"))[:, 1]
        if self.use_mvsec:
            stamps = stamps[1:]
        self.depth_stamps = stamps - self.event_dataset.initial_stamp
        self.depth_files = index_files(self.depth_folder, "depth", self.use_mvsec)
        self.frame_files = index_files(self.frame_folder, "image", self.use_mvsec)
        self.length = len(self.event_dataset)

    def __len__(self) -> int:
        return self.length

    def num_packages(self) -> int:
        return self.length // self.every_x_rgb_frame

    def __getitem__(self, i: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        assert 0 <= i < self.num_packages()
        if seed is None:
            seed = int(np.random.randint(0, 2 ** 31))
        K = self.every_x_rgb_frame

        chunks = []
        stamp = frame_idx = None
        for k in range(K):
            j = i * K + k
            stamp = self.event_dataset.get_stamp_at(j)
            chunks.append(self.event_dataset[j])
        events_raw = np.concatenate(chunks, axis=0)
        frame_idx, f_stamp = first_element_greater_than(self.depth_stamps, stamp)
        assert f_stamp is not None and f_stamp - stamp < 1e-5

        depth = np.load(self.depth_files[frame_idx]).astype(np.float32)
        depth = depth_to_log_np(depth, self.clip_distance, self.reg_factor)[..., None]
        depth = _apply_transform(depth, self.transform, seed)

        gray = None
        path = self.frame_files.get(frame_idx)
        if path is not None:
            rgb = _read_image(path)
            g = rgb_to_gray_np(rgb) if rgb.ndim == 3 else rgb
            gray = _apply_transform((g / 255.0)[..., None], self.transform, seed)

        h, w = depth.shape[0], depth.shape[1]
        # voxelize at the native sensor resolution (C++ host kernel when
        # available), then transform
        h0, w0 = self._sensor_size()
        from ..ops.voxel import events_to_voxel_grid_host
        grid = events_to_voxel_grid_host(events_raw.astype(np.float32),
                                         self.num_bins, h0, w0,
                                         normalize=self.normalize)
        grid = _apply_transform(np.moveaxis(grid, 0, -1), self.transform, seed)

        item = {
            "image": np.concatenate([grid, gray], axis=-1) if gray is not None else grid,
            "depth_image": depth,
            "events": np.zeros((0, h, w, 0), np.float32),
            "depth_events": np.zeros((0, h, w, 1), np.float32),
        }
        if self.use_phased_arch:
            item["times_image"] = np.float32(stamp)
        return item

    def _sensor_size(self) -> Tuple[int, int]:
        # derive from the first depth frame (events carry no size metadata)
        d = np.load(next(iter(self.depth_files.values())))
        return d.shape[0], d.shape[1]


# ---------------------------------------------------------------------------
# sequence windowing (TBPTT)
# ---------------------------------------------------------------------------


@DATASETS.register("SequenceSynchronizedFramesEventsDataset")
class SequenceSynchronizedFramesEventsDataset:
    """Length-L windows of datapackages with shared augmentation seed and
    optional pause augmentation (dataset.py:23-141).

    Returns a dict of L-stacked arrays:
      'events' [L, K, H, W, C], 'image' [L, H, W, C],
      'depth_events' [L, K, H, W, 1], 'depth_image' [L, H, W, 1],
      optional 'times_*'.
    """

    def __init__(self, base_folder: str, event_folder: str,
                 depth_folder: str = "frames", frame_folder: str = "rgb",
                 flow_folder: str = "flow", semantic_folder: str = "semantic/data",
                 start_time: float = 0.0, stop_time: float = 0.0,
                 sequence_length: int = 2, transform=None,
                 proba_pause_when_running: float = 0.0,
                 proba_pause_when_paused: float = 0.0,
                 step_size: int = 20, clip_distance: float = 100.0,
                 normalize: bool = True, scale_factor: float = 1.0,
                 use_phased_arch: bool = False, every_x_rgb_frame: int = 1,
                 baseline: Union[bool, str] = False, loss_composition=False,
                 reg_factor: float = 5.7, recurrency: bool = True,
                 load_semantic: bool = False):
        assert sequence_length > 0 and step_size > 0 and clip_distance > 0
        self.L = sequence_length
        if recurrency:
            self.dataset = SynchronizedFramesEventsDataset(
                base_folder, event_folder, depth_folder, frame_folder,
                flow_folder, semantic_folder, start_time, stop_time,
                clip_distance, every_x_rgb_frame, transform,
                normalize=normalize, use_phased_arch=use_phased_arch,
                baseline=baseline, loss_composition=loss_composition,
                reg_factor=reg_factor, load_semantic=load_semantic)
        else:
            self.dataset = SynchronizedFramesEventsRawDataset(
                base_folder, event_folder, depth_folder, frame_folder,
                flow_folder, semantic_folder, start_time, stop_time,
                clip_distance, every_x_rgb_frame, transform,
                normalize=normalize, use_phased_arch=use_phased_arch,
                baseline=baseline, loss_composition=loss_composition,
                reg_factor=reg_factor)
        self.event_dataset = self.dataset.event_dataset
        self.step_size = step_size
        self.every_x_rgb_frame = every_x_rgb_frame
        self.proba_pause_when_running = proba_pause_when_running
        self.proba_pause_when_paused = proba_pause_when_paused
        self.scale_factor = scale_factor
        # window count arithmetic mirrors dataset.py:60-64
        if self.L * every_x_rgb_frame >= self.dataset.length:
            self.length = 0
        else:
            self.length = ((self.dataset.length - self.L * every_x_rgb_frame)
                           // step_size // every_x_rgb_frame + 1)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, i: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        assert 0 <= i < self.length
        if seed is None:
            seed = int(np.random.randint(0, 2 ** 31))
        rng = np.random.RandomState(seed ^ 0x5EED)

        packages: List[Dict[str, np.ndarray]] = []
        j = i * self.step_size
        k = 0
        packages.append(self.dataset.__getitem__(j, seed))
        paused = False
        for _ in range(self.L - 1):
            u = rng.rand()
            proba = self.proba_pause_when_paused if paused else self.proba_pause_when_running
            paused = bool(u < proba)
            if paused:
                item = dict(self.dataset.__getitem__(j + k, seed))
                item["events"] = np.zeros_like(item["events"])
                packages.append(item)
            else:
                k += 1
                packages.append(self.dataset.__getitem__(j + k, seed))

        out: Dict[str, np.ndarray] = {}
        keys = packages[0].keys()
        for key in keys:
            vals = [p[key] for p in packages]
            out[key] = np.stack(vals)

        if self.scale_factor < 1.0:
            out = {k: self._downsample(k, v) for k, v in out.items()}
        return out

    def _downsample(self, key: str, v: np.ndarray) -> np.ndarray:
        if key.startswith("times") or v.ndim < 3:
            return v
        import cv2
        s = self.scale_factor
        interp = cv2.INTER_NEAREST if "semantic" in key else cv2.INTER_LINEAR

        def resize_hw(img):
            h, w = img.shape[0], img.shape[1]
            r = cv2.resize(img, (int(w * s), int(h * s)), interpolation=interp)
            if r.ndim == 2:
                r = r[..., None]
            return r

        if v.ndim == 4:   # [K, H, W, C] or [L, H, W, C]
            return np.stack([resize_hw(x) for x in v])
        if v.ndim == 5:   # [L, K, H, W, C]
            return np.stack([np.stack([resize_hw(x) for x in l]) for l in v])
        return resize_hw(v)
