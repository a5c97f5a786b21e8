"""End-to-end integration: train CLI -> checkpoint -> test CLI (streaming
inference + output tree) -> evaluation CLI (metric parity oracle), all on
synthetic EventScape-format data.  Plus checkpoint round-trips, including
export of a reference-loadable .pth.tar."""
import json
import os
import subprocess
import sys
from os.path import join

import numpy as np
import pytest

import jax

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.train.optim import make_optimizer
from rpg_ramnet_tpu.train.checkpoint import CheckpointManager, export_pth_tar, load_any
from rpg_ramnet_tpu.data.synthetic import generate_split

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_config_dict(save_dir, name="e2e_run"):
    return {
        "name": name, "cuda": False, "gpu": 0,
        "data_loader": {
            "train": {
                "type": "SequenceSynchronizedFramesEventsDataset",
                "base_folder": "train", "depth_folder": "depth/data",
                "frame_folder": "rgb/data", "event_folder": "events/voxels",
                "proba_pause_when_running": 0.0, "proba_pause_when_paused": 0.0,
                "step_size": 2, "clip_distance": 80.0, "every_x_rgb_frame": 5,
                "scale_factor": 1, "reg_factor": 3.70378, "baseline": False,
            },
            "validation": {
                "type": "SequenceSynchronizedFramesEventsDataset",
                "base_folder": "val", "depth_folder": "depth/data",
                "frame_folder": "rgb/data", "event_folder": "events/voxels",
                "proba_pause_when_running": 0.0, "proba_pause_when_paused": 0.0,
                "step_size": 2, "clip_distance": 80.0, "every_x_rgb_frame": 5,
                "scale_factor": 1, "reg_factor": 3.70378, "baseline": False,
            },
            "batch_size": 2, "num_workers": 2, "pin_memory": False,
            "normalize": True, "shuffle": True, "crop_size": 32,
        },
        "lr_scheduler_type": "ExponentialLR", "lr_scheduler_freq": 100,
        "lr_scheduler": {"gamma": 0.5},
        "optimizer_type": "Adam", "optimizer": {"lr": 0.0003, "weight_decay": 0},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "grad_loss": {"weight": 0.25},
        "metrics": ["mse", "abs_rel_diff", "scale_invariant_error", "median_error"],
        "trainer": {
            "epochs": 1, "sequence_length": 2, "save_dir": save_dir,
            "save_freq": 1, "verbosity": 1, "monitor": "val_loss",
            "monitor_mode": "min", "num_previews": 1, "num_val_previews": 1,
            "still_previews": True, "grid_loss": True,
            "loss_composition": ["image", "events4"], "loss_weights": [1, 1],
        },
        "arch": "ERGB2DepthRecurrent", "use_phased_arch": False,
        "model": {
            "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
            "recurrent_block_type": "conv", "state_combination": "convgru",
            "spatial_resolution": [32, 32], "num_encoders": 2,
            "base_num_channels": 4, "num_residual_blocks": 1,
            "use_upsample_conv": True, "norm": "none",
        },
    }


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    data_root = ws / "datasets"
    generate_split(str(data_root / "train"), n_sequences=2, n_frames=25,
                   height=48, width=64, events_per_frame=500)
    generate_split(str(data_root / "val"), n_sequences=1, n_frames=25,
                   height=48, width=64, events_per_frame=500, seed=7)
    generate_split(str(data_root / "test"), n_sequences=1, n_frames=25,
                   height=48, width=64, events_per_frame=500, seed=11)
    return ws


def run(cmd, env_extra=None, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=cwd,
                       timeout=900)
    assert r.returncode == 0, f"cmd {cmd} failed:\n{r.stdout}\n{r.stderr}"
    return r


def test_checkpoint_roundtrip(tmp_path):
    cfg = Config.from_dict(tiny_config_dict(str(tmp_path)))
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save("checkpoint-epoch0", params, opt_state, epoch=0,
             monitor_best=1.5, config=cfg.raw)
    p2, o2, meta = mgr.restore(str(tmp_path / "run" / "checkpoint-epoch0"),
                               params, opt_state)
    assert meta["epoch"] == 0 and meta["monitor_best"] == 1.5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, p2)


def test_phased_params_torch_state_dict_roundtrip():
    """Phased param trees survive the torch state_dict mapping BITWISE,
    and the gate parameters land under the reference's lazily-created
    module names (submodules.py:377-391 instantiates `phased_cell` as a
    child of `recurrent_block` at first forward, so a TRAINED reference
    phased checkpoint carries `...recurrent_block.phased_cell.{tau,phase}`
    — the 1-D leaves must pass through untransposed)."""
    from rpg_ramnet_tpu.compat.torch_import import (params_to_state_dict,
                                                    state_dict_to_params)
    from rpg_ramnet_tpu.core.config import ModelConfig

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 2, "base_num_channels": 4, "num_residual_blocks": 1,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 2,
        "baseline": False, "use_phased_arch": True,
        "spatial_resolution": [16, 16]})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    sd = params_to_state_dict(params)
    taus = sorted(k for k in sd if k.endswith(".tau"))
    assert taus == [
        "statenetphasedrecurrent.encoders_events.0.recurrent_block.phased_cell.tau",
        "statenetphasedrecurrent.encoders_events.1.recurrent_block.phased_cell.tau",
        "statenetphasedrecurrent.encoders_rgb.0.recurrent_block.phased_cell.tau",
        "statenetphasedrecurrent.encoders_rgb.1.recurrent_block.phased_cell.tau",
    ]
    assert sd[taus[0]].ndim == 1          # per-flattened-feature, no transpose
    p2 = state_dict_to_params(sd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, p2)


def test_pth_tar_export_loads_into_reference(tmp_path):
    """Our exported .pth.tar must strict-load into the reference torch model
    (name/shape compatibility both directions)."""
    import torch
    from reference_loader import make_reference_model
    cfg_d = dict(num_bins_rgb=1, num_bins_events=5, skip_type="sum",
                 state_combination="convgru", num_encoders=3, base_num_channels=8,
                 num_residual_blocks=2, recurrent_block_type="conv", norm="none",
                 use_upsample_conv=True, every_x_rgb_frame=5, baseline=False,
                 loss_composition=["image", "events4"], gpu=0,
                 spatial_resolution=[32, 32], use_phased_arch=False)
    cfg = Config.from_dict({"model": cfg_d, "arch": "ERGB2DepthRecurrent",
                            "trainer": {"loss_composition": ["image", "events4"]},
                            "data_loader": {"train": {"every_x_rgb_frame": 5,
                                                      "baseline": False}}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(1), cfg.model)
    path = str(tmp_path / "export.pth.tar")
    export_pth_tar(path, params, "ERGB2DepthRecurrent", cfg.raw)

    tm = make_reference_model("ERGB2DepthRecurrent", cfg_d)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(ckpt["state_dict"], strict=True)  # names+shapes match

    # and back: load_any on the .pth.tar returns our param tree
    params2, _ = load_any(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        params, params2)


@pytest.mark.slow
def test_train_cli_with_mesh(workspace, tmp_path):
    """train.py with data-parallel mesh over 8 virtual CPU devices
    (Trainer's replicate + per-key shard + packed-batch path)."""
    ws = workspace
    cfg = tiny_config_dict(str(tmp_path / "runs"), name="mesh_run")
    cfg["data_loader"]["batch_size"] = 2
    cfg["mesh"] = {"data": 2, "model": 1}
    cfg_path = str(tmp_path / "mesh_config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    run([sys.executable, "train.py", "--config", cfg_path],
        env_extra={
            "PREPROCESSED_DATASETS_FOLDER": str(ws / "datasets"),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        })
    run_dir = join(str(tmp_path / "runs"), "mesh_run")
    assert os.path.exists(join(run_dir, "model_best"))
    with open(join(run_dir, "train_log.jsonl")) as f:
        log = json.loads(f.readline())
    assert np.isfinite(log["train_loss"])


@pytest.mark.slow
def test_mvsec_inference_cli(workspace, tmp_path):
    """BASELINE config 3 analog: streaming inference over MVSEC-format data
    (event_tensor_/depth_/frame_ naming, stamp quirks) through test.py."""
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
    ws = workspace
    mv_root = tmp_path / "datasets" / "mvsec_test"
    generate_eventscape_sequence(str(mv_root / "mvsec_outdoor_day1"),
                                 n_frames=20, height=48, width=64,
                                 events_per_frame=400, mvsec=True)
    cfg_dict = tiny_config_dict(str(tmp_path), name="mvsec_run")
    for split in ("train", "validation"):
        cfg_dict["data_loader"][split]["every_x_rgb_frame"] = 1
    cfg_dict["model"]["num_bins_events"] = 5
    cfg = Config.from_dict(cfg_dict)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    run_dir = tmp_path / "run"
    opt = make_optimizer(cfg)
    CheckpointManager(str(run_dir)).save(
        "model_best", params, opt.init(params), epoch=0, monitor_best=0.0,
        config=cfg_dict)
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg_dict, f)

    out_dir = str(tmp_path / "mvsec_out")
    run([sys.executable, "test.py",
         "--path_to_model", str(run_dir / "model_best"),
         "--config", str(run_dir / "config.json"),
         "--output_path", out_dir,
         "--data_folder", "mvsec_test",
         "--crop", "32,32"],
        env_extra={"PREPROCESSED_DATASETS_FOLDER": str(tmp_path / "datasets")})
    preds = os.listdir(join(out_dir, "npy", "image"))
    assert len(preds) >= 2


@pytest.mark.smoke
def test_depth_stream_cli(tmp_path):
    """Live streaming demo: raw event log -> voxelize -> recurrent model."""
    cfg_dict = tiny_config_dict(str(tmp_path))
    cfg = Config.from_dict(cfg_dict)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    run_dir = tmp_path / "run"
    opt = make_optimizer(cfg)
    mgr = CheckpointManager(str(run_dir))
    mgr.save("model_best", params, opt.init(params), epoch=0,
             monitor_best=0.0, config=cfg_dict)
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg_dict, f)

    rng = np.random.RandomState(0)
    n = 4000
    t = np.sort(rng.uniform(0, 0.4, n))
    lines = ["0 48 64\n"] + [
        f"{t[i]:.6f} {rng.randint(0, 64)} {rng.randint(0, 48)} {rng.randint(0, 2)}\n"
        for i in range(n)]
    ev_path = tmp_path / "events.txt"
    with open(ev_path, "w") as f:
        f.writelines(lines)

    out_dir = tmp_path / "stream_out"
    run([sys.executable, "depth_stream.py",
         "-i", str(ev_path),
         "--path_to_model", str(run_dir / "model_best"),
         "--height", "48", "--width", "64",
         "--fixed_duration", "--window_duration", "100",
         "-o", str(out_dir), "--save_numpy"])
    frames = os.listdir(out_dir / "frames")
    assert len(frames) >= 2
    npys = os.listdir(out_dir / "npy")
    d = np.load(out_dir / "npy" / sorted(npys)[0])
    assert d.shape == (1, 48, 64) and np.all(np.isfinite(d))


@pytest.mark.slow
def test_full_pipeline_cli(workspace):
    """train.py -> test.py -> evaluation.py on synthetic data."""
    ws = workspace
    save_dir = str(ws / "runs")
    cfg_path = str(ws / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(tiny_config_dict(save_dir), f)
    env = {"PREPROCESSED_DATASETS_FOLDER": str(ws / "datasets")}

    r = run([sys.executable, "train.py", "--config", cfg_path, "--no_mesh"],
            env_extra=env)
    run_dir = join(save_dir, "e2e_run")
    assert os.path.exists(join(run_dir, "model_best"))
    assert os.path.exists(join(run_dir, "config.json"))
    assert os.path.exists(join(run_dir, "train_log.jsonl"))

    out_dir = str(ws / "test_out")
    run([sys.executable, "test.py",
         "--path_to_model", join(run_dir, "model_best"),
         "--config", join(run_dir, "config.json"),
         "--output_path", out_dir,
         "--data_folder", "test",
         "--crop", "32,32"], env_extra=env)
    npy_dir = join(out_dir, "npy", "image")
    gt_dir = join(out_dir, "ground_truth", "npy", "depth_image")
    preds = sorted(os.listdir(npy_dir))
    assert len(preds) >= 2, preds
    assert os.path.exists(join(out_dir, "depth", "image"))
    assert os.path.exists(join(out_dir, "color_map", "image"))

    # lane-batched CLI mode produces the same npy outputs
    out_dir2 = str(ws / "test_out_lanes")
    run([sys.executable, "test.py",
         "--path_to_model", join(run_dir, "model_best"),
         "--config", join(run_dir, "config.json"),
         "--output_path", out_dir2,
         "--data_folder", "test",
         "--crop", "32,32", "--lanes", "2"], env_extra=env)
    for f in sorted(os.listdir(npy_dir)):
        a = np.load(join(npy_dir, f))
        b = np.load(join(out_dir2, "npy", "image", f))
        np.testing.assert_allclose(a, b, atol=1e-5)

    # chunked deferred-decode CLI mode (--scan_chunk) too
    out_dir3 = str(ws / "test_out_chunk")
    run([sys.executable, "test.py",
         "--path_to_model", join(run_dir, "model_best"),
         "--config", join(run_dir, "config.json"),
         "--output_path", out_dir3,
         "--data_folder", "test",
         "--crop", "32,32", "--scan_chunk", "4"], env_extra=env)
    for f in sorted(os.listdir(npy_dir)):
        a = np.load(join(npy_dir, f))
        b = np.load(join(out_dir3, "npy", "image", f))
        np.testing.assert_allclose(a, b, atol=1e-5)

    # lanes x chunk combined mode (per-step reset masks in the scan)
    out_dir4 = str(ws / "test_out_lanes_chunk")
    run([sys.executable, "test.py",
         "--path_to_model", join(run_dir, "model_best"),
         "--config", join(run_dir, "config.json"),
         "--output_path", out_dir4,
         "--data_folder", "test",
         "--crop", "32,32", "--lanes", "2", "--scan_chunk", "2"],
        env_extra=env)
    for f in sorted(os.listdir(npy_dir)):
        a = np.load(join(npy_dir, f))
        b = np.load(join(out_dir4, "npy", "image", f))
        np.testing.assert_allclose(a, b, atol=1e-5)

    r = run([sys.executable, "evaluation.py",
             "--target_dataset", gt_dir,
             "--predictions_dataset", npy_dir,
             "--clip_distance", "80.0",
             "--reg_factor", "3.70378",
             "--crop_ymax", "260"], env_extra=env)
    assert "_abs_rel_diff" in r.stdout
    # parse the abs_rel metric and sanity-check it's finite
    for line in r.stdout.splitlines():
        if line.startswith("_abs_rel_diff"):
            val = float(line.split(":")[1])
            assert np.isfinite(val) and val >= 0
            break
    else:
        raise AssertionError("abs_rel_diff not printed")

    # --debug: the reference's per-frame inspection grids
    # (RAM_Net/evaluation.py:246-292) saved headlessly to --output_folder,
    # plus the per-frame metric printout
    dbg_dir = str(ws / "eval_debug")
    r = run([sys.executable, "evaluation.py",
             "--target_dataset", gt_dir,
             "--predictions_dataset", npy_dir,
             "--clip_distance", "80.0",
             "--reg_factor", "3.70378",
             "--crop_ymax", "260",
             "--debug", "--idx", "0",
             "--output_folder", dbg_dir], env_extra=env)
    panels = [f for f in os.listdir(dbg_dir) if f.startswith("debug")]
    assert any(f == "debug_0000000000.png" for f in panels), panels
    # cutoff-prefixed panels for the same frame too (reference passes
    # debug into every add_to_metrics call)
    assert any("_80_" in f for f in panels), panels
    assert "frame 0:" in r.stdout


@pytest.mark.slow
def test_test_cli_with_mesh(workspace, tmp_path):
    """test.py --mesh N: the data-parallel streaming mode (lanes sharded
    over the mesh data axis, BASELINE config 5) and the spatial
    single-stream mode must both write npy outputs identical to the plain
    single-device run."""
    ws = workspace
    cfg_dict = tiny_config_dict(str(tmp_path), name="mesh_test_run")
    cfg = Config.from_dict(cfg_dict)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(4), cfg.model)
    run_dir = tmp_path / "run"
    opt = make_optimizer(cfg)
    CheckpointManager(str(run_dir)).save(
        "model_best", params, opt.init(params), epoch=0, monitor_best=0.0,
        config=cfg_dict)
    with open(run_dir / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    env = {"PREPROCESSED_DATASETS_FOLDER": str(ws / "datasets"),
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    base = [sys.executable, "test.py",
            "--path_to_model", str(run_dir / "model_best"),
            "--config", str(run_dir / "config.json"),
            "--data_folder", "test", "--crop", "32,32"]

    out_ref = str(tmp_path / "out_ref")
    run(base + ["--output_path", out_ref], env_extra=env)
    npy_dir = join(out_ref, "npy", "image")
    files = sorted(os.listdir(npy_dir))
    assert len(files) >= 2

    # data-parallel lanes x chunk under a 2-device mesh
    out_dp = str(tmp_path / "out_dp")
    run(base + ["--output_path", out_dp, "--lanes", "2", "--scan_chunk", "2",
                "--mesh", "2"], env_extra=env)
    # spatial single-stream under a 2-device mesh
    out_sp = str(tmp_path / "out_sp")
    run(base + ["--output_path", out_sp, "--mesh", "2"], env_extra=env)
    for out_dir in (out_dp, out_sp):
        for f in files:
            a = np.load(join(npy_dir, f))
            b = np.load(join(out_dir, "npy", "image", f))
            np.testing.assert_allclose(a, b, atol=1e-5,
                                       err_msg=f"{out_dir}/{f}")
