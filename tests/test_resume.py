"""Checkpoint-resume reproducibility: train N epochs straight vs train,
stop, resume — parameters must match bitwise (deterministic loader epochs +
restored optimizer state; reference base_trainer.py:160-179 semantics)."""
import json
import numpy as np
import pytest

import jax

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.data import concatenate_subfolders, BatchLoader, CenterCrop
from rpg_ramnet_tpu.data.synthetic import generate_split
from rpg_ramnet_tpu.train.trainer import Trainer


def make_cfg(save_dir, name):
    return Config.from_dict({
        "name": name, "arch": "ERGB2DepthRecurrent", "use_phased_arch": False,
        "data_loader": {
            "train": {"every_x_rgb_frame": 5, "baseline": False,
                      "clip_distance": 80.0, "reg_factor": 3.70378,
                      "step_size": 2},
            "batch_size": 2,
        },
        "optimizer_type": "Adam", "optimizer": {"lr": 3e-4, "weight_decay": 0},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "grad_loss": {"weight": 0.25},
        "trainer": {"epochs": 2, "sequence_length": 2, "save_dir": save_dir,
                    "save_freq": 1, "verbosity": 0, "monitor": "train_loss",
                    "monitor_mode": "min", "num_previews": 0,
                    "num_val_previews": 0, "still_previews": False,
                    "movie": False,
                    "loss_composition": ["image", "events4"],
                    "loss_weights": [1, 1]},
        "model": {"num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
                  "recurrent_block_type": "conv", "state_combination": "convgru",
                  "num_encoders": 2, "base_num_channels": 4,
                  "num_residual_blocks": 1, "use_upsample_conv": True,
                  "norm": "none"},
    })


def make_loader(root):
    ds = concatenate_subfolders(
        root, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=2, step_size=2,
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378,
        transform=CenterCrop(32))
    return BatchLoader(ds, batch_size=2, shuffle=True, num_workers=1, seed=7)


def test_resume_bitwise_reproducible(tmp_path):
    data_root = str(tmp_path / "data")
    generate_split(data_root, n_sequences=1, n_frames=30, height=32, width=48,
                   events_per_frame=200)

    # straight-through 2 epochs
    t1 = Trainer(make_cfg(str(tmp_path / "runs"), "straight"),
                 make_loader(data_root), use_mesh=False)
    t1.train()
    p_straight = jax.device_get(t1.params)

    # 1 epoch, then resume for the 2nd
    cfg_a = Config.from_dict({**make_cfg(str(tmp_path / "runs"), "resumable").raw,
                              "trainer": {**make_cfg(str(tmp_path / "runs"),
                                                     "resumable").raw["trainer"],
                                          "epochs": 1}})
    t2 = Trainer(cfg_a, make_loader(data_root), use_mesh=False)
    t2.train()

    cfg_b = make_cfg(str(tmp_path / "runs"), "resumable2")
    t3 = Trainer(cfg_b, make_loader(data_root),
                 resume=str(tmp_path / "runs" / "resumable" / "checkpoint-epoch0"),
                 use_mesh=False)
    assert t3.start_epoch == 1
    t3.train()
    p_resumed = jax.device_get(t3.params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6, rtol=1e-6),
        p_straight, p_resumed)
