"""Raw-event pipeline with ON-DEVICE voxelization.

The reference voxelizes raw events on the CPU inside DataLoader workers
(dataset_asynchronous.py:253-298, the hot CPU loop).  TPU-first redesign
(BASELINE north star): the host only pads raw event windows to bucketed
fixed shapes with validity counts; voxelization + normalization run on the
TPU (Pallas / MXU kernel) inside the double-buffered prefetch stage, jitted
and batched over all windows of a batch.

Shapes: a batch of event windows is [B, L, K, N_max, 4] + counts [B, L, K];
the device stage produces [B, L, K, H, W, num_bins] voxel grids ready for
the model — identical values to the host path (same kernel semantics).
"""
from __future__ import annotations

import functools
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import voxel as V


def bucket_size(n: int, buckets: Sequence[int] = (2048, 8192, 32768, 131072, 524288)) -> int:
    """Static-shape bucketing for per-window event counts (irregular MVSEC
    counts stay jit-friendly: few distinct compiled shapes)."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + 524287) // 524288) * 524288


def pad_event_windows(windows: List[np.ndarray],
                      n_max: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """List of [N_i, 4] windows -> ([W, N_max, 4] padded, [W] counts)."""
    counts = np.array([w.shape[0] for w in windows], np.int32)
    if n_max is None:
        n_max = bucket_size(int(counts.max()) if len(counts) else 1)
    out = np.zeros((len(windows), n_max, 4), np.float32)
    for i, w in enumerate(windows):
        out[i, :w.shape[0]] = w[:, :4]
    return out, counts


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width",
                                             "backend", "normalize"))
def voxelize_batch(events, counts, *, num_bins: int, height: int, width: int,
                   backend: str = "scatter", normalize: bool = True):
    """[..., N, 4] padded events + [...] counts -> [..., H, W, num_bins].

    All leading dims are vmapped; the kernel runs per window on device.
    """
    fn = {"pallas": V.events_to_voxel_grid_pallas,
          "matmul": V.events_to_voxel_grid_matmul,
          "sortseg": V.events_to_voxel_grid_sortseg,
          "scatter": V.events_to_voxel_grid_scatter}[backend]

    def one(ev, n):
        # NOTE: sortseg's fused stats epilogue (with_stats=True) exists and
        # is exact, but measured SLOWER on v5e (235.5 -> 187.0 Mev/s,
        # exp/vox_v3_verify.json — the second pallas output breaks the
        # revisited grid block's stay-resident pattern), while the separate
        # XLA normalize reduction costs only ~7 us at this grid size; so
        # the two-pass normalize stays the default.
        g = fn(ev, n, num_bins=num_bins, height=height, width=width)
        if normalize:
            g = V.normalize_voxel_grid(g)
        return jnp.moveaxis(g, 0, -1)  # CHW -> HWC

    lead = events.shape[:-2]
    flat_ev = events.reshape((-1,) + events.shape[-2:])
    flat_n = counts.reshape(-1)
    grids = jax.vmap(one)(flat_ev, flat_n)
    return grids.reshape(lead + grids.shape[1:])


class RawEventSequenceDataset:
    """Sequence windows over RAW events: like
    SequenceSynchronizedFramesEventsDataset but the 'events' entry is the
    PADDED raw event array (voxelization deferred to device).

    Output per index: {'events_raw': [L, K, N_max, 4],
                       'events_count': [L, K],
                       'image': [L, H, W, 1],
                       'depth_events': [L, K, H, W, 1],
                       'depth_image': [L, H, W, 1]}
    """

    def __init__(self, base_folder: str, event_folder: str,
                 depth_folder: str = "depth/data", frame_folder: str = "rgb/data",
                 sequence_length: int = 2, step_size: int = 1,
                 clip_distance: float = 100.0, every_x_rgb_frame: int = 1,
                 reg_factor: float = 5.7, transform=None, n_max: Optional[int] = None):
        from .datasets import SynchronizedFramesEventsDataset, RawEventsDataset
        # reuse the synchronized dataset for depth/frames; bypass its voxels
        self.sync = SynchronizedFramesEventsDataset(
            base_folder, event_folder, depth_folder, frame_folder,
            clip_distance=clip_distance, every_x_rgb_frame=every_x_rgb_frame,
            reg_factor=reg_factor, transform=transform, baseline="rgb")
        self.raw = RawEventsDataset(base_folder, event_folder.replace("voxels", "data"))
        self.L = sequence_length
        self.step_size = step_size
        self.K = every_x_rgb_frame
        self.n_max = n_max
        if self.L * self.K >= len(self.raw):
            self.length = 0
        else:
            self.length = (len(self.raw) - self.L * self.K) // step_size // self.K + 1

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, i: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        assert 0 <= i < self.length
        j0 = i * self.step_size
        images, d_events, d_images = [], [], []
        windows: List[np.ndarray] = []
        for l in range(self.L):
            pkg = self.sync.__getitem__(j0 + l, seed)
            images.append(pkg["image"])
            d_images.append(pkg["depth_image"])
            step_depths = []
            for k in range(self.K):
                j = (j0 + l) * self.K + k
                windows.append(self.raw[j].astype(np.float32))
                step_depths.append(pkg["depth_image"])  # per-step GT at pkg rate
            d_events.append(np.stack(step_depths))
        padded, counts = pad_event_windows(windows, self.n_max)
        n_max = padded.shape[1]
        return {
            "events_raw": padded.reshape(self.L, self.K, n_max, 4),
            "events_count": counts.reshape(self.L, self.K),
            "image": np.stack(images),
            "depth_events": np.stack(d_events),
            "depth_image": np.stack(d_images),
        }


def device_voxelize_prefetch(iterator: Iterator, *, num_bins: int, height: int,
                             width: int, backend: str = "auto",
                             normalize: bool = True, sharding=None,
                             size: int = 2):
    """Prefetch wrapper: upload raw-event batches, voxelize ON DEVICE, and
    hand the model a standard batch dict ({'events': [B,L,K,H,W,C], ...}).
    Double-buffered so voxelization overlaps the consumer's compute."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "scatter"

    def stage(batch):
        dev = {k: (jax.device_put(v, sharding) if sharding is not None
                   else jax.device_put(v)) for k, v in batch.items()}
        ev = voxelize_batch(dev.pop("events_raw"), dev.pop("events_count"),
                            num_bins=num_bins, height=height, width=width,
                            backend=backend, normalize=normalize)
        dev["events"] = ev
        return dev

    buf = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(stage(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = None
        try:
            nxt = stage(next(it))
        except StopIteration:
            pass
        cur = buf.pop(0)
        if nxt is not None:
            buf.append(nxt)
        yield cur
