"""Training visualization helpers.

Capability reference: RAM_Net/utils/training_utils.py (count_parameters:7,
select_evenly_spaced_elements:11, flow2rgb:15, plot_grad_flow_bars:85 — the
log-scale gradient-magnitude figure written to TensorBoard each epoch).
Grad-flow here consumes an optax gradient pytree instead of
model.named_parameters().
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import jax


def count_parameters(params) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))


def select_evenly_spaced_elements(num_elements: int, sequence_length: int) -> List[int]:
    return [i * sequence_length // num_elements + sequence_length // (2 * num_elements)
            for i in range(num_elements)]


def flow2rgb(disp_x: np.ndarray, disp_y: np.ndarray, max_magnitude=None) -> np.ndarray:
    """Optic-flow field -> HSV-coded RGB image, [3, H, W] in [0, 1]."""
    import matplotlib.colors
    h, w = disp_x.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    mag = np.sqrt(disp_x ** 2 + disp_y ** 2)
    ang = np.arctan2(disp_y, disp_x)
    ang[ang < 0] += 2 * np.pi
    hsv = np.zeros((h, w, 3), np.float32)
    hsv[..., 0] = ang / (2 * np.pi)
    hsv[..., 1] = 1.0
    hsv[..., 2] = mag / max_magnitude if max_magnitude else \
        np.clip(mag / (np.max(mag) + 1e-9), 0, 1)
    rgb = matplotlib.colors.hsv_to_rgb(hsv)
    return np.moveaxis(rgb, -1, 0)


def _flatten_with_names(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_with_names(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_with_names(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def plot_grad_flow_bars(grads):
    """Average-gradient-magnitude bar chart per parameter (log scale), the
    TB 'grad_figure' of the reference (training_utils.py:85-124).  Takes a
    gradient pytree; returns a matplotlib figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    named = _flatten_with_names(grads)
    names, avgs = [], []
    for name, g in named.items():
        if name.endswith("weight") or name.endswith("bias"):
            names.append(name)
            avgs.append(float(np.abs(g).mean()))
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.25), 4))
    ax.bar(np.arange(len(avgs)), avgs, lw=1, color="c")
    ax.set_yscale("log")
    ax.set_xticks(np.arange(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=4)
    ax.set_xlabel("Layers")
    ax.set_ylabel("average gradient magnitude")
    ax.set_title("Gradient flow")
    fig.tight_layout()
    return fig


def add_video_gif(tb, tag: str, video, fps: int, global_step: int):
    """TensorBoard video summary WITHOUT moviepy (absent in this image;
    torch's add_video silently no-ops without it).  A TB 'video' is just a
    GIF inside an image summary — encode it with PIL and emit the proto
    directly.  video: [1, T, C, H, W] float in [0, 1].
    Capability parity with reference lstm_trainer.py:518-523 (fps=5)."""
    import io

    import numpy as np
    from PIL import Image
    from tensorboard.compat.proto.summary_pb2 import Summary

    v = (np.clip(np.asarray(video), 0, 1) * 255).astype(np.uint8)
    t, c, h, w = v.shape[1:]
    frames = [Image.fromarray(v[0, i, 0] if c == 1
                              else np.moveaxis(v[0, i], 0, -1))
              for i in range(t)]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True,
                   append_images=frames[1:],
                   duration=max(int(1000 / fps), 1), loop=0)
    image = Summary.Image(height=h, width=w, colorspace=c,
                          encoded_image_string=buf.getvalue())
    tb._get_file_writer().add_summary(
        Summary(value=[Summary.Value(tag=tag, image=image)]), global_step)
