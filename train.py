#!/usr/bin/env python
"""Training CLI — reference-compatible surface.

Flags and behavior mirror RAM_Net/train.py:246-279:
  --config / -c           JSON config (reference schema, usable as-is)
  --resume / -r           checkpoint dir to resume (epoch+optimizer restored)
  --initial_checkpoint/-i weights-only init (.pth.tar or our checkpoint dir)
  --gpu_id / -g           accepted for CLI compat (device selection is JAX's)
Dataset root comes from $PREPROCESSED_DATASETS_FOLDER (train.py:95).
Duplicate run dirs are refused (train.py:276).
"""
import argparse
import json
import logging
import os
from os.path import join

logging.basicConfig(level=logging.INFO, format="")


def main():
    parser = argparse.ArgumentParser(description="RAM-Net TPU training")
    parser.add_argument("-c", "--config", default=None, type=str)
    parser.add_argument("-r", "--resume", default=None, type=str)
    parser.add_argument("-i", "--initial_checkpoint", default=None, type=str)
    parser.add_argument("-g", "--gpu_id", default=None, type=int,
                        help="accepted for reference CLI compat; unused on TPU")
    parser.add_argument("--no_mesh", action="store_true",
                        help="disable multi-device data parallelism")
    args = parser.parse_args()

    config_dict = None
    if args.resume is not None:
        if args.resume.endswith((".pth.tar", ".pth")):
            # reference checkpoint: config is embedded (reference train.py:271)
            import torch
            config_dict = torch.load(args.resume, map_location="cpu",
                                     weights_only=False).get("config")
        else:
            with open(join(args.resume, "meta.json")) as f:
                config_dict = json.load(f)["config"]
    if args.config is not None:
        with open(args.config) as f:
            config_dict = json.load(f)
        run_path = join(config_dict["trainer"]["save_dir"], config_dict["name"])
        if args.resume is None:
            assert not os.path.exists(run_path), f"Path {run_path} already exists!"
    assert config_dict is not None, "need --config or --resume"

    from rpg_ramnet_tpu.utils import ensure_platform
    ensure_platform(matmul_precision=config_dict.get("matmul_precision"))
    from rpg_ramnet_tpu.core.config import Config
    from rpg_ramnet_tpu.data import (Compose, RandomRotationFlip, RandomCrop,
                                     CenterCrop, concatenate_subfolders, BatchLoader)
    from rpg_ramnet_tpu.train.trainer import Trainer
    from rpg_ramnet_tpu.train.checkpoint import load_any

    cfg = Config.from_dict(config_dict)

    root = os.environ["PREPROCESSED_DATASETS_FOLDER"]
    recurrency = cfg.arch != "ERGB2Depth"

    def build(split_cfg, transform):
        return concatenate_subfolders(
            join(root, split_cfg.base_folder), split_cfg.type,
            split_cfg.event_folder, split_cfg.depth_folder,
            split_cfg.frame_folder,
            sequence_length=cfg.trainer.sequence_length,
            transform=transform,
            proba_pause_when_running=split_cfg.proba_pause_when_running,
            proba_pause_when_paused=split_cfg.proba_pause_when_paused,
            step_size=split_cfg.step_size,
            clip_distance=split_cfg.clip_distance,
            every_x_rgb_frame=split_cfg.every_x_rgb_frame,
            normalize=cfg.normalize, scale_factor=split_cfg.scale_factor,
            use_phased_arch=cfg.use_phased_arch, baseline=split_cfg.baseline,
            loss_composition=cfg.trainer.loss_composition,
            reg_factor=split_cfg.reg_factor, recurrency=recurrency)

    # reference transforms: train RandomRotationFlip(0,0.5,0)+RandomCrop(224),
    # val CenterCrop(224) (train.py:149-150,174); crop size overridable via
    # config data_loader.crop_size (TPU extra; static shapes must fit data)
    crop = int(config_dict.get("data_loader", {}).get("crop_size", 224))
    train_ds = build(cfg.train_data,
                     Compose([RandomRotationFlip(0.0, 0.5, 0.0), RandomCrop(crop)]))
    val_ds = build(cfg.val_data, CenterCrop(crop))

    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=cfg.shuffle,
                               num_workers=cfg.num_workers)
    val_loader = BatchLoader(val_ds, cfg.batch_size, shuffle=False,
                             num_workers=cfg.num_workers)

    initial_params = None
    if args.initial_checkpoint is not None:
        initial_params, _ = load_any(args.initial_checkpoint)
        print(f"Loaded initial model weights from: {args.initial_checkpoint}")

    trainer = Trainer(cfg, train_loader, val_loader, resume=args.resume,
                      initial_params=initial_params, use_mesh=not args.no_mesh)
    trainer.train()


if __name__ == "__main__":
    main()
