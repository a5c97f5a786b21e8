"""TensorBoard media logging: per-epoch prediction MOVIES (reference
lstm_trainer.py:518-523, fps=5 — GIF-encoded here, moviepy-free) and
'--record' state-change visualizations (lstm_trainer.py:295-377)."""
import glob
import numpy as np

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.data import concatenate_subfolders, BatchLoader, CenterCrop
from rpg_ramnet_tpu.data.synthetic import generate_split
from rpg_ramnet_tpu.train.trainer import Trainer


def make_cfg(save_dir):
    return Config.from_dict({
        "name": "tb_media", "arch": "ERGB2DepthRecurrent",
        "use_phased_arch": False,
        "data_loader": {
            "train": {"every_x_rgb_frame": 2, "baseline": False,
                      "clip_distance": 80.0, "reg_factor": 3.70378,
                      "step_size": 2},
            "batch_size": 2,
        },
        "optimizer_type": "Adam", "optimizer": {"lr": 3e-4, "weight_decay": 0},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "grad_loss": {"weight": 0.25},
        "metrics": ["abs_rel_diff", "mse"],
        "trainer": {"epochs": 1, "sequence_length": 2, "save_dir": save_dir,
                    "save_freq": 1, "verbosity": 0, "monitor": "train_loss",
                    "monitor_mode": "min", "num_previews": 1,
                    "num_val_previews": 0, "still_previews": True,
                    "movie": True, "state_preview": True,
                    "loss_composition": ["image", "events1"],
                    "loss_weights": [1, 1]},
        "model": {"num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
                  "recurrent_block_type": "conv", "state_combination": "convgru",
                  "num_encoders": 2, "base_num_channels": 4,
                  "num_residual_blocks": 1, "use_upsample_conv": True,
                  "norm": "none"},
    })


def test_movie_and_state_previews_logged(tmp_path):
    data_root = str(tmp_path / "data")
    generate_split(data_root, n_sequences=1, n_frames=16, height=32, width=48,
                   events_per_frame=200)
    ds = concatenate_subfolders(
        data_root, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=2, step_size=2,
        clip_distance=80.0, every_x_rgb_frame=2, reg_factor=3.70378,
        transform=CenterCrop(32))
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    t = Trainer(make_cfg(str(tmp_path / "runs")), loader, use_mesh=False)
    t.train()

    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    tb_dir = glob.glob(str(tmp_path / "runs" / "tb_media" / "tensorboard"))[0]
    acc = EventAccumulator(tb_dir, size_guidance={"images": 0})
    acc.Reload()
    img_tags = acc.Tags()["images"]
    movie_tags = [t_ for t_ in img_tags if t_.startswith("movie_")]
    state_tags = [t_ for t_ in img_tags if t_.startswith("state_change_")]
    assert movie_tags, img_tags
    assert state_tags, img_tags
    # the movie payload is a real multi-frame GIF
    img = acc.Images(movie_tags[0])[0]
    assert img.encoded_image_string[:6] in (b"GIF87a", b"GIF89a")
    from io import BytesIO
    from PIL import Image
    gif = Image.open(BytesIO(img.encoded_image_string))
    n_frames = getattr(gif, "n_frames", 1)
    assert n_frames >= 2, n_frames
    # preview metric scalars present
    scalar_tags = acc.Tags()["scalars"]
    assert any(s.startswith("preview_metric_") for s in scalar_tags), scalar_tags
