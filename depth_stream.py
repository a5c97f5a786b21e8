#!/usr/bin/env python
"""Live depth-from-events streaming demo.

The reference vendors argparse bundles for an (unshipped) streaming depth
demo (RAM_Net/options/inference_options.py:87-175).  This script is the
working TPU equivalent: raw events from a .txt/.zip log are windowed
(fixed duration or fixed count), voxelized ON DEVICE with the Pallas
kernel, preprocessed (hot pixels / flip / normalize), run through the
recurrent model, and written/displayed per window.

Usage:
  python depth_stream.py -i events.txt --path_to_model <ckpt> \
      --height 260 --width 346 [--fixed_duration --window_duration 50] \
      [-o out_dir --save_numpy --save_color_map] [--display]
"""
import argparse
import os
from os.path import join

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Streaming depth prediction from events")
    parser.add_argument("-i", "--input_file", required=True, type=str,
                        help="path to events .txt or .zip (rows: t x y pol)")
    parser.add_argument("--path_to_model", required=True, type=str)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--height", type=int, default=260)
    parser.add_argument("--width", type=int, default=346)
    parser.add_argument("--fixed_duration", action="store_true")
    parser.add_argument("--window_duration", type=float, default=50.0,
                        help="ms (with --fixed_duration)")
    parser.add_argument("--num_events_per_pixel", type=float, default=0.35)
    parser.add_argument("--skipevents", type=int, default=0)
    parser.add_argument("--no_normalize", action="store_true")
    from rpg_ramnet_tpu.options import set_depth_inference_options
    set_depth_inference_options(parser)
    args = parser.parse_args()

    from rpg_ramnet_tpu.utils import ensure_platform, Timer
    ensure_platform()
    import jax.numpy as jnp
    import json
    from rpg_ramnet_tpu.core.config import Config
    from rpg_ramnet_tpu.ops import events_to_voxel_grid, normalize_voxel_grid
    from rpg_ramnet_tpu.ops.event_preprocess import EventPreprocessor
    from rpg_ramnet_tpu.eval.inference import StreamingInference, CropParameters
    from rpg_ramnet_tpu.eval.filters import UnsharpMaskFilter, ImageFilter
    from rpg_ramnet_tpu.eval.writers import make_event_preview, ensure_dir, _imwrite
    from rpg_ramnet_tpu.train.checkpoint import load_any
    from rpg_ramnet_tpu.utils.event_readers import (FixedSizeEventReader,
                                                    FixedDurationEventReader)

    if args.config is None:
        head = os.path.split(args.path_to_model)[0]
        with open(join(head, "config.json")) as f:
            config_dict = json.load(f)
    else:
        with open(args.config) as f:
            config_dict = json.load(f)
    cfg = Config.from_dict(config_dict)
    mcfg = cfg.model
    params, _ = load_any(args.path_to_model)

    num_bins = mcfg.num_bins_events
    H, W = args.height, args.width
    crop = CropParameters(W, H, mcfg.num_encoders)

    if args.fixed_duration:
        reader = FixedDurationEventReader(args.input_file,
                                          duration_ms=args.window_duration,
                                          start_index=args.skipevents)
    else:
        n_events = int(W * H * args.num_events_per_pixel)
        reader = FixedSizeEventReader(args.input_file, num_events=n_events,
                                      start_index=args.skipevents)

    preprocessor = EventPreprocessor(no_normalize=args.no_normalize,
                                     flip=args.flip,
                                     hot_pixels_file=args.hot_pixels_file)
    unsharp = UnsharpMaskFilter(args.unsharp_mask_amount, args.unsharp_mask_sigma)
    bilateral = ImageFilter(args.bilateral_filter_sigma)

    engine = StreamingInference(params, mcfg, cfg.arch)
    engine.reset(1, crop.height_crop, crop.width_crop)

    display = None
    if args.display:
        from rpg_ramnet_tpu.eval.display import DepthDisplay
        display = DepthDisplay("depth", reg_factor=args.reg_factor)

    out_dir = args.output_folder
    if out_dir:
        ensure_dir(out_dir)
        ensure_dir(join(out_dir, "npy"))
        ensure_dir(join(out_dir, "frames"))

    idx = 0
    for events in reader:
        with Timer("voxelization"):
            n = events.shape[0]
            grid = events_to_voxel_grid(
                jnp.asarray(events, jnp.float32), jnp.int32(n),
                num_bins=num_bins, height=H, width=W)
            grid = preprocessor(jnp.moveaxis(grid, 0, -1))
        grid = crop.pad(np.asarray(grid))

        with Timer("inference"):
            # events-only streaming: each window is one event-modality
            # encoder sweep + decode (no frame branch between windows)
            modality = "image" if mcfg.is_baseline else "events"
            pred = engine.step_modality(grid, modality)
        depth = crop.crop(np.asarray(unsharp(pred)))[..., 0]
        depth = bilateral(depth)

        if display is not None:
            display.show(depth, args.display_wait_time)
        if out_dir:
            if args.save_numpy:
                np.save(join(out_dir, "npy", f"depth_{idx:010d}.npy"), depth[None])
            _imwrite(join(out_dir, "frames", f"frame_{idx:010d}.png"), depth * 255.0)
            if args.show_events:
                ev_img = make_event_preview(np.asarray(grid),
                                            mode=args.event_display_mode,
                                            num_bins_to_show=args.num_bins_to_show)
                _imwrite(join(out_dir, "frames", f"events_{idx:010d}.png"), ev_img)
        idx += 1
    print(f"processed {idx} windows")


if __name__ == "__main__":
    main()
