#!/usr/bin/env python
"""Offline evaluation CLI — reference-compatible flags and printout.

Mirrors RAM_Net/evaluation.py:16-36 (FLAGS) and its __main__ loop; the metric
math lives in rpg_ramnet_tpu/eval/evaluation.py (the parity oracle for
BASELINE abs-rel/SiLog targets).
"""
import argparse


def flags():
    parser = argparse.ArgumentParser("Event Depth Data estimation.")
    parser.add_argument("--target_dataset", default="", required=True)
    parser.add_argument("--predictions_dataset", default="", required=True)
    parser.add_argument("--event_masks", default="")
    parser.add_argument("--crop_ymax", default=260, type=int)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--idx", type=int, default=-1)
    parser.add_argument("--start_idx", type=int, default=-1)
    parser.add_argument("--prediction_offset", type=int, default=0)
    parser.add_argument("--target_offset", type=int, default=0)
    parser.add_argument("--rescale", action="store_true", default=False)
    parser.add_argument("--clip_distance", type=float, default=80.0)
    parser.add_argument("--output_folder", type=str, default=None)
    parser.add_argument("--down_scale_factor", type=float, default=1.0)
    parser.add_argument("--reg_factor", type=float, default=0.0)
    return parser.parse_args()


def main():
    args = flags()
    from rpg_ramnet_tpu.eval.evaluation import evaluate_directories
    metrics = evaluate_directories(
        target_dataset=args.target_dataset,
        predictions_dataset=args.predictions_dataset,
        clip_distance=args.clip_distance,
        reg_factor=args.reg_factor,
        crop_ymax=args.crop_ymax,
        event_masks=args.event_masks,
        prediction_offset=args.prediction_offset,
        target_offset=args.target_offset,
        down_scale_factor=args.down_scale_factor,
        rescale=args.rescale,
        output_folder=args.output_folder,
        debug=args.debug, debug_idx=args.idx,
    )
    for k, v in metrics.items():
        print("%s : %f" % (k, v))
    print("----------------------------------------------")
    for _, v in metrics.items():
        print("%f" % v)


if __name__ == "__main__":
    main()
