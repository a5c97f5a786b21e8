"""Synthetic dataset generation in the reference's on-disk formats.

No real EventScape/MVSEC data is vendored with the reference (only download
links, README.md:62-68), so tests and benchmarks generate small synthetic
sequences that exercise the exact same file layouts and timestamp semantics:

  EventScape style:  <seq>/events/voxels/*_%04d_voxel.npy (+timestamps.txt)
                     <seq>/events/data/*_%04d_events.npy
                     <seq>/depth/data/*_%04d_depth.npy
                     <seq>/rgb/data/*_%04d_image.png
                     <seq>/semantic/data/*_%04d_gt_labelIds.png
  MVSEC style:       event_tensor_%010d.npy / depth_%010d.npy / frame_%010d.png
"""
from __future__ import annotations

import os
from os.path import join
from typing import Optional

import numpy as np

from ..ops.voxel import events_to_voxel_grid_np


def _write_timestamps(folder: str, stamps: np.ndarray):
    os.makedirs(folder, exist_ok=True)
    with open(join(folder, "timestamps.txt"), "w") as f:
        for i, t in enumerate(stamps):
            f.write(f"{i} {t:.9f}\n")


def _save_png(path: str, img: np.ndarray):
    from PIL import Image
    Image.fromarray(img).save(path)


def _scene(idx: int, h: int, w: int, rng: np.random.RandomState, seed: int = 0):
    """A deterministic moving-box scene: returns (depth[m], gray[0..255]).
    `seed` shifts the scene so different sequences have different depth/rgb
    content (otherwise cross-implementation alignment bugs can hide)."""
    idx = idx + 37 * seed
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = 20.0 + 30.0 * (yy / h) + 5.0 * np.sin(xx / 7.0 + idx * 0.3)
    bx = int((idx * 3) % max(w - 12, 1))
    by = int((idx * 2) % max(h - 12, 1))
    depth[by:by + 10, bx:bx + 10] = 5.0 + (idx % 7)
    gray = (127 + 80 * np.sin(xx / 5.0 - idx * 0.4) * np.cos(yy / 9.0)).clip(0, 255)
    gray[by:by + 10, bx:bx + 10] = 230
    return depth.astype(np.float32), gray.astype(np.uint8)


def generate_eventscape_sequence(root: str, n_frames: int = 40, height: int = 64,
                                 width: int = 64, num_bins: int = 5,
                                 events_per_frame: int = 2000, seed: int = 0,
                                 dt: float = 0.01, mvsec: bool = False):
    """Write one synthetic sequence folder under `root`."""
    rng = np.random.RandomState(seed)
    stamps = 100.0 + dt * np.arange(n_frames)

    if mvsec:
        ev_dir = join(root, "events/voxels")
        raw_dir = join(root, "events/data")
        depth_dir = join(root, "depth/data")
        rgb_dir = join(root, "rgb/data")
        sem_dir = join(root, "semantic/data")
    else:
        ev_dir = join(root, "events/voxels")
        raw_dir = join(root, "events/data")
        depth_dir = join(root, "depth/data")
        rgb_dir = join(root, "rgb/data")
        sem_dir = join(root, "semantic/data")
    for d in (ev_dir, raw_dir, depth_dir, rgb_dir, sem_dir):
        os.makedirs(d, exist_ok=True)
        if mvsec and d in (depth_dir, rgb_dir):
            # MVSEC layout: the reference drops the FIRST depth stamp
            # (dataset.py:208-209) and the LAST event tensor
            # (event_dataset.py:79-80); a leading dummy stamp line makes
            # trimmed stamp j align with file index j, as in real MVSEC
            _write_timestamps(d, np.concatenate([[stamps[0] - dt], stamps]))
        else:
            _write_timestamps(d, stamps)

    for i in range(n_frames):
        depth, gray = _scene(i, height, width, rng, seed=seed)
        # raw events in (t_{i-1}, t_i]
        t0 = stamps[i] - dt
        t = np.sort(rng.uniform(t0, stamps[i], events_per_frame))
        x = rng.randint(0, width, events_per_frame).astype(np.float64)
        y = rng.randint(0, height, events_per_frame).astype(np.float64)
        p = rng.randint(0, 2, events_per_frame).astype(np.float64)
        raw = np.stack([t, x, y, p], axis=1)
        voxel = events_to_voxel_grid_np(raw.copy(), num_bins, height, width)

        sem = (depth < 15).astype(np.uint8) * 10 + 1
        rgb = np.stack([gray, gray, gray], axis=-1)

        if mvsec:
            np.save(join(ev_dir, f"event_tensor_{i:010d}.npy"), voxel)
            np.save(join(depth_dir, f"depth_{i:010d}.npy"), depth)
            _save_png(join(rgb_dir, f"frame_{i:010d}.png"), rgb)
        else:
            np.save(join(ev_dir, f"seq_{i:04d}_voxel.npy"), voxel)
            np.save(join(raw_dir, f"seq_{i:04d}_events.npy"), raw)
            np.save(join(depth_dir, f"seq_{i:04d}_depth.npy"), depth)
            _save_png(join(rgb_dir, f"seq_{i:04d}_image.png"), rgb)
            _save_png(join(sem_dir, f"seq_{i:04d}_gt_labelIds.png"), sem)
    return root


def generate_split(root: str, n_sequences: int = 2, mvsec: bool = False, **kw):
    """A split folder with several sequence subfolders (what
    concatenate_subfolders expects)."""
    name = "mvsec_seq" if mvsec else "seq"
    seed0 = kw.pop("seed", 0)
    for s in range(n_sequences):
        generate_eventscape_sequence(join(root, f"{name}{s:02d}"),
                                     seed=seed0 + s, mvsec=mvsec, **kw)
    return root
