"""Host input-path benchmark at REAL data scale (VERDICT r2 #6).

The reference trains at 256x512 EventScape with RandomCrop(224), B=8, L=10,
every_x=5 (train.py:149-150, configs).  One training window therefore reads
8 x 10 x (5 voxel npys @ 2.6 MB + 1 PNG + 6 depth npys @ 0.5 MB) ~= 1.3 GB
from page cache per optimizer step.  The device consumes 9.5 windows-of-8/s
/ 8 = 1.19 batches/s (PERF.md) — this measures whether the host loader can
feed that.

NOTE this rig has nproc=1: the numbers below are a single-core floor; a real
v5e-8 TPU VM host has ~200 vCPUs and the pool scales.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rpg_ramnet_tpu.data import (BatchLoader, CenterCrop, Compose,
                                 concatenate_subfolders)
from rpg_ramnet_tpu.data.augmentation import RandomCrop, RandomRotationFlip
from rpg_ramnet_tpu.data.synthetic import generate_split
from rpg_ramnet_tpu.train.sequence_loss import pack_train_batch

B, L, K = 8, 10, 5


def main():
    root = "/tmp/host_bench_data"
    if not os.path.exists(root):
        print("generating 260x520 synthetic split (~1 GB)...", flush=True)
        generate_split(root, n_sequences=2, n_frames=145, height=260, width=520,
                       events_per_frame=3000)
    tf = Compose([RandomRotationFlip(0.0, 0.5, 0.0), RandomCrop(224)])
    ds = concatenate_subfolders(
        root, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=L, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=K, reg_factor=3.70378,
        transform=tf)
    print("dataset windows:", len(ds), flush=True)
    results = {"nproc": os.cpu_count(), "windows": len(ds)}
    for workers in (1, 4):
        loader = BatchLoader(ds, batch_size=B, shuffle=True,
                             num_workers=workers, seed=0, drop_last=True)
        it = iter(loader)
        next(it)  # warm page cache + pool
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            packed = pack_train_batch(batch)
            n += 1
            if n >= 4:
                break
        dt = time.perf_counter() - t0
        bps = n / dt
        results[f"batches_per_s_workers{workers}"] = round(bps, 3)
        results[f"vs_device_rate_workers{workers}"] = round(bps / 1.19, 2)
        print(f"workers={workers}: {bps:.3f} batches(x{B} windows)/s "
              f"({bps/1.19:.2f}x the 1.19 batches/s device rate)", flush=True)
    # single-item latency decomposition
    t0 = time.perf_counter()
    item, _ = ds[0]
    results["single_window_load_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
