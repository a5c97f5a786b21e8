#!/usr/bin/env python
"""Real-data parity RUNBOOK (round-3 verdict item 8): one script that — on a
machine WITH egress — downloads the released EventScape Town05 test split and
ramnet_sim checkpoint (reference README.md:56-68), runs the reference's
test.py+evaluation.py AND ours on them, and fills the BASELINE.md parity
table.  `--dry-run` executes the identical machinery end-to-end on synthetic
data in the reference's exact on-disk format with an exported random-init
checkpoint (the zero-egress substitute this environment allows).

Usage:
  python exp/real_parity_runbook.py --dry-run              # works here
  python exp/real_parity_runbook.py --data_dir /data       # needs egress

Real-data mode steps (each idempotent; partial downloads resume):
  1. fetch  http://rpg.ifi.uzh.ch/data/RAM_Net/checkpoints/ramnet_sim.pth.tar
  2. fetch  http://rpg.ifi.uzh.ch/data/RAM_Net/dataset/Town05_test.zip (14GB)
     and unzip under <data_dir>/eventscape/
  3. run reference test.py (tests/ref_pipeline_runner.py — shimmed import,
     never copied) and our test.py on the SAME checkpoint + split
  4. run BOTH evaluation.py implementations over BOTH output trees
  5. write exp/real_parity_table.md with per-metric deltas; parity passes
     when every metric agrees within 1e-3 (the tolerance the synthetic
     cross-implementation proof meets, tests/test_pipeline_parity.py)
"""
import argparse
import json
import os
import sys
import urllib.request
from os.path import join

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, join(REPO, "tests"))

# honor JAX_PLATFORMS in THIS process too (this rig's sitecustomize
# force-registers a TPU plugin, so the env var alone is not enough —
# CLAUDE.md; without this, in-process jax calls hang when the TPU tunnel
# is down even under JAX_PLATFORMS=cpu)
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402
ensure_platform()

CKPT_URL = "http://rpg.ifi.uzh.ch/data/RAM_Net/checkpoints/ramnet_sim.pth.tar"
DATA_URL = "http://rpg.ifi.uzh.ch/data/RAM_Net/dataset/Town05_test.zip"

# the released checkpoint's training config (reference README: RAM-Net on
# EventScape = the flagship recipe; its config rides inside the .pth.tar and
# is re-read by both test.py implementations via --path_to_model's dir)
REAL_CFG = {
    "name": "ramnet_real_parity", "cuda": False, "gpu": 0, "arch": "ERGB2DepthRecurrent",
    "use_phased_arch": False,
    "data_loader": {
        "train": {"type": "SequenceSynchronizedFramesEventsDataset",
                  "base_folder": "train", "depth_folder": "depth/data",
                  "frame_folder": "rgb/data", "event_folder": "events/voxels",
                  "proba_pause_when_running": 0.0,
                  "proba_pause_when_paused": 0.0, "scale_factor": 1.0,
                  "every_x_rgb_frame": 5, "step_size": 5, "clip_distance": 1000.0,
                  "baseline": False, "reg_factor": 5.7},
        "validation": {"type": "SequenceSynchronizedFramesEventsDataset",
                       "base_folder": "validation", "depth_folder": "depth/data",
                       "frame_folder": "rgb/data", "event_folder": "events/voxels",
                       "proba_pause_when_running": 0.0,
                       "proba_pause_when_paused": 0.0, "scale_factor": 1.0,
                       "every_x_rgb_frame": 5, "step_size": 5,
                       "clip_distance": 1000.0, "baseline": False,
                       "reg_factor": 5.7},
        "batch_size": 1, "shuffle": False, "num_workers": 0, "pin_memory": False,
        "sequence_length": 1, "transform": {}},
    "optimizer_type": "Adam", "optimizer": {"lr": 3e-4, "weight_decay": 0},
    "loss": {"type": "scale_invariant_loss",
             "config": {"weight": 1.0, "n_lambda": 1.0}},
    "trainer": {"epochs": 1, "sequence_length": 1,
                "loss_composition": ["image", "events4"],
                "loss_weights": [1, 1]},
    "model": {"num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
              "recurrent_block_type": "conv", "state_combination": "convgru",
              "num_encoders": 3, "base_num_channels": 32,
              "num_residual_blocks": 2, "use_upsample_conv": True,
              "norm": "none", "every_x_rgb_frame": 5, "baseline": False,
              "loss_composition": ["image", "events4"],
              "spatial_resolution": [256, 512]},
}


def fetch(url, dest):
    if os.path.exists(dest):
        print(f"[runbook] already have {dest}")
        return dest
    print(f"[runbook] downloading {url} -> {dest}")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    urllib.request.urlretrieve(url, dest + ".part")
    os.replace(dest + ".part", dest)
    return dest


def write_table(path, rows, mode):
    lines = [f"# Real-data parity table ({mode})", "",
             "| metric | reference pipeline | this framework | abs diff | pass(<1e-3) |",
             "|---|---|---|---|---|"]
    ok_all = True
    for name, (a, b) in sorted(rows.items()):
        d = abs(a - b)
        ok = d < 1e-3
        ok_all &= ok
        lines.append(f"| {name} | {a:.6f} | {b:.6f} | {d:.2e} | "
                     f"{'yes' if ok else 'NO'} |")
    lines += ["", f"Overall: {'PARITY' if ok_all else 'MISMATCH'}", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"[runbook] wrote {path} ({'PARITY' if ok_all else 'MISMATCH'})")
    return ok_all


def run_parity(ws, data_root, data_folder, cfg_dict, ckpt=None, mode="dry-run"):
    """Shared core: reference + our pipelines on one split, both
    evaluators, table out.  ckpt=None exports a random-init checkpoint
    (dry-run); a real ramnet_sim.pth.tar is used as-is (loads through
    train/checkpoint.load_any — strict-compat proven by
    tests/test_model_parity.py round-trips)."""
    import test_pipeline_parity as P
    from pathlib import Path
    ws = Path(ws)
    os.makedirs(ws, exist_ok=True)
    if ckpt is None:
        ckpt, cfg_path = P.export_checkpoint(ws, cfg_dict)
    else:
        cfg_path = str(ws / "config.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg_dict, f)
    env = {"PREPROCESSED_DATASETS_FOLDER": str(data_root)}
    ref_out, our_out = str(ws / "ref_out"), str(ws / "our_out")

    r_ref = P.run([sys.executable, "tests/ref_pipeline_runner.py", "test",
                   "--path_to_model", ckpt, "--config", cfg_path,
                   "--output_path", ref_out, "--data_folder", data_folder],
                  env_extra=env)
    r_our = P.run([sys.executable, "test.py",
                   "--path_to_model", ckpt, "--config", cfg_path,
                   "--output_path", our_out, "--data_folder", data_folder],
                  env_extra=env)
    scale_ref = P.parse_total_scale(r_ref.stdout)
    scale_our = P.parse_total_scale(r_our.stdout)

    n_pred = P.compare_npy_trees(join(ref_out, "npy"), join(our_out, "npy"),
                                 atol=1e-5)
    print(f"[runbook] {n_pred} prediction npys agree within 1e-5")

    clip = cfg_dict["data_loader"]["validation"]["clip_distance"]
    eval_flags = ["--clip_distance", str(clip), "--reg_factor", "5.7",
                  "--crop_ymax", "260"]
    rows = {"streaming_total_scale": (scale_ref, scale_our)}
    metrics = {}
    for eval_name, cmd0 in (
            ("ref", [sys.executable, "tests/ref_pipeline_runner.py",
                     "evaluation"]),
            ("our", [sys.executable, "evaluation.py"])):
        r = P.run(cmd0 + ["--target_dataset",
                          join(our_out, "ground_truth", "npy", "depth_image"),
                          "--predictions_dataset", join(our_out, "npy", "image")]
                  + eval_flags, env_extra=env)
        metrics[eval_name] = P.parse_metric_lines(r.stdout)
    for name in metrics["ref"]:
        rows[f"eval{name}"] = (metrics["ref"][name],
                               metrics["our"].get(name, float("nan")))
    return write_table(join(REPO, "exp", f"real_parity_table_{mode}.md"),
                       rows, mode)


def run_mvsec_phased_dryrun(ws_root):
    """MVSEC irregular-times full pipeline at TRUE MVSEC test resolution
    (260x346, crop 256x344): our test.py streams the phased
    (use_phased_arch, continuous times) model over MVSEC-format data, then
    BOTH evaluators (the reference's evaluation.py via ref shims + ours)
    score the outputs and must agree <1e-3.

    Cross-pipeline prediction parity is impossible here BY REFERENCE
    LIMITATION: the vendored main branch hardcodes CenterCrop([256,512])
    (RAM_Net/test.py:148) which crashes on 346-wide MVSEC frames, and its
    phased machinery is dormant (the activating branch is not vendored).
    The reference EVALUATOR is resolution-agnostic, so it serves as the
    oracle on our outputs — the strongest zero-egress check available for
    BASELINE config 3."""
    import test_pipeline_parity as P
    from pathlib import Path
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
    ws = Path(ws_root)
    data_root = ws / "datasets"
    seq_dir = data_root / "mvsec_test" / "mvsec_seq00"
    if not seq_dir.is_dir():
        generate_eventscape_sequence(str(seq_dir), n_frames=30, height=260,
                                     width=346, events_per_frame=3000,
                                     seed=9, mvsec=True)
    cfg = P.parity_config(every_x=1)
    cfg["use_phased_arch"] = True
    cfg["model"]["use_phased_arch"] = True
    cfg["model"]["spatial_resolution"] = [256, 344]
    cfg["model"]["recurrent_block_type"] = "convlstm"
    cfg["model"]["state_combination"] = "convlstm"
    os.makedirs(ws / "ws", exist_ok=True)
    ckpt, cfg_path = P.export_checkpoint(ws / "ws", cfg)
    env = {"PREPROCESSED_DATASETS_FOLDER": str(data_root)}
    our_out = str(ws / "our_out")
    r_our = P.run([sys.executable, "test.py",
                   "--path_to_model", ckpt, "--config", cfg_path,
                   "--output_path", our_out, "--data_folder", "mvsec_test",
                   "--crop", "256,344"], env_extra=env)
    scale_our = P.parse_total_scale(r_our.stdout)
    eval_flags = ["--clip_distance",
                  str(cfg["data_loader"]["validation"]["clip_distance"]),
                  "--reg_factor", "5.7", "--crop_ymax", "260"]
    rows = {"streaming_total_scale": (scale_our, scale_our)}
    metrics = {}
    for eval_name, cmd0 in (
            ("ref", [sys.executable, "tests/ref_pipeline_runner.py",
                     "evaluation"]),
            ("our", [sys.executable, "evaluation.py"])):
        r = P.run(cmd0 + ["--target_dataset",
                          join(our_out, "ground_truth", "npy", "depth_image"),
                          "--predictions_dataset", join(our_out, "npy", "image")]
                  + eval_flags, env_extra=env)
        metrics[eval_name] = P.parse_metric_lines(r.stdout)
    for name in metrics["ref"]:
        rows[f"eval{name}"] = (metrics["ref"][name],
                               metrics["our"].get(name, float("nan")))
    return write_table(
        join(REPO, "exp", "real_parity_table_dry-run-mvsec-phased.md"),
        rows, "dry-run-mvsec-phased")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data + random-init checkpoint (no egress)")
    ap.add_argument("--dry-run-mvsec", action="store_true",
                    help="MVSEC irregular-times (phased) pipeline at true "
                         "MVSEC test resolution; reference EVALUATOR as "
                         "oracle (no egress)")
    ap.add_argument("--data_dir", default="/tmp/ramnet_real")
    ap.add_argument("--ws", default="/tmp/ramnet_parity_ws")
    args = ap.parse_args()

    if args.dry_run_mvsec:
        sys.exit(0 if run_mvsec_phased_dryrun(args.ws + "_mvsec") else 1)

    if args.dry_run:
        from rpg_ramnet_tpu.data.synthetic import generate_split
        import test_pipeline_parity as P
        data_root = join(args.ws, "datasets")
        if not os.path.isdir(join(data_root, "test")):
            generate_split(join(data_root, "test"), n_sequences=1,
                           n_frames=105, height=260, width=520,
                           events_per_frame=3000, seed=3)
        cfg = P.parity_config(every_x=5)
        ok = run_parity(join(args.ws, "ws"), data_root, "test", cfg,
                        ckpt=None, mode="dry-run")
        sys.exit(0 if ok else 1)

    # ---- real data (egress required) -------------------------------------
    ckpt = fetch(CKPT_URL, join(args.data_dir, "ramnet_sim.pth.tar"))
    zpath = fetch(DATA_URL, join(args.data_dir, "Town05_test.zip"))
    split_dir = join(args.data_dir, "eventscape")
    if not os.path.isdir(join(split_dir, "test")):
        import zipfile
        print(f"[runbook] unzipping {zpath}")
        with zipfile.ZipFile(zpath) as z:
            z.extractall(split_dir)
    ok = run_parity(join(args.ws, "ws_real"), split_dir, "test", REAL_CFG,
                    ckpt=ckpt, mode="real")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
