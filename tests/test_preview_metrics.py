"""Preview TB metric semantics (reference lstm_trainer.py:488-516).

The reference accumulates, per preview sample and per prediction key, the
metric of that key's FIRST-timestep prediction against groundtruth_targets[0]
— which is the `new_target` carried out of the loss loop of step 0, i.e. the
depth of the LAST supervised key in prediction-dict order
(lstm_trainer.py:283,:377), NOT the per-key ground truth.  Default mode
reproduces that exactly; `preview_metrics_all_steps` opts into the corrected
per-key / all-timestep average.
"""
import numpy as np
import jax

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.data import concatenate_subfolders, BatchLoader, CenterCrop
from rpg_ramnet_tpu.data.synthetic import generate_split
from rpg_ramnet_tpu.train.trainer import Trainer
from rpg_ramnet_tpu.eval.metrics import get_metric
from rpg_ramnet_tpu.utils.training_utils import select_evenly_spaced_elements


class _TBRecorder:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = value

    def add_image(self, *a, **k):
        pass

    def add_histogram(self, *a, **k):
        pass


def _make_cfg(save_dir, all_steps):
    return Config.from_dict({
        "name": "preview_metrics", "arch": "ERGB2DepthRecurrent",
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
                    "movie": False, "state_preview": False,
                    "loss_composition": ["image", "events1"],
                    "loss_weights": [1, 1],
                    "preview_metrics_all_steps": all_steps},
        "model": {"num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
                  "recurrent_block_type": "conv", "state_combination": "convgru",
                  "num_encoders": 2, "base_num_channels": 4,
                  "num_residual_blocks": 1, "use_upsample_conv": True,
                  "norm": "none"},
    })


def _make_loader(tmp_path):
    data_root = str(tmp_path / "data")
    generate_split(data_root, n_sequences=1, n_frames=16, height=32, width=48,
                   events_per_frame=200)
    ds = concatenate_subfolders(
        data_root, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=2, step_size=2,
        clip_distance=80.0, every_x_rgb_frame=2, reg_factor=3.70378,
        transform=CenterCrop(32))
    return BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)


def _expected(trainer, loader, metric_names, all_steps):
    """Recompute the preview metric vector independently of _write_previews."""
    mcfg = trainer.cfg.model
    idx = select_evenly_spaced_elements(1, len(loader.dataset))[0]
    item, _ = loader.dataset[idx]
    seq = {"events": jax.numpy.asarray(item["events"][None]),
           "image": jax.numpy.asarray(item["image"][None])}
    h, w = item["image"].shape[1], item["image"].shape[2]
    state0 = trainer.model.init_state(mcfg, 1, h, w)
    _, preds = trainer.model.forward_sequence(trainer.params, mcfg, state0, seq)

    def gt_for(key):
        if key == "image":
            return item["depth_image"][:, :, :, 0]
        return item["depth_events"][:, int(key[len("events"):]), :, :, 0]

    sup = trainer.cfg.trainer.loss_composition
    sup_keys = [k for k in preds if (not sup) or k in sup]
    gt_ref = gt_for(sup_keys[-1])
    out = np.zeros(len(metric_names))
    for key in preds:
        pred = np.asarray(preds[key])[:, 0, :, :, 0]
        gt = gt_for(key)
        for mi, name in enumerate(metric_names):
            fn = get_metric(name)
            if all_steps:
                out[mi] += float(np.nanmean(
                    [fn(pred[t][None, None], gt[t][None, None])
                     for t in range(pred.shape[0])]))
            else:
                out[mi] += fn(pred[0][None, None], gt_ref[0][None, None])
    return out  # num_previews == 1


def test_preview_metric_reference_semantics(tmp_path):
    loader = _make_loader(tmp_path)
    cfg = _make_cfg(str(tmp_path / "runs"), all_steps=False)
    t = Trainer(cfg, loader, use_mesh=False)
    t.tb = _TBRecorder()
    t._write_previews(0, "preview_", loader, 1)
    expected = _expected(t, loader, ["abs_rel_diff", "mse"], all_steps=False)
    got = np.array([t.tb.scalars["preview_metric_abs_rel_diff"],
                    t.tb.scalars["preview_metric_mse"]])
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # sanity: the reference quirk really is in play — the events0 prediction
    # is scored against the image GT, so the default differs from the
    # per-key-GT variant
    object.__setattr__(t.cfg.trainer, "preview_metrics_all_steps", True)
    t.tb = _TBRecorder()
    t._write_previews(0, "preview_", loader, 1)
    corrected = np.array([t.tb.scalars["preview_metric_abs_rel_diff"],
                          t.tb.scalars["preview_metric_mse"]])
    assert not np.allclose(got, corrected)


def test_preview_metric_all_steps_mode(tmp_path):
    loader = _make_loader(tmp_path)
    cfg = _make_cfg(str(tmp_path / "runs"), all_steps=True)
    t = Trainer(cfg, loader, use_mesh=False)
    t.tb = _TBRecorder()
    t._write_previews(0, "preview_", loader, 1)
    expected = _expected(t, loader, ["abs_rel_diff", "mse"], all_steps=True)
    got = np.array([t.tb.scalars["preview_metric_abs_rel_diff"],
                    t.tb.scalars["preview_metric_mse"]])
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    assert np.isfinite(got).all()
