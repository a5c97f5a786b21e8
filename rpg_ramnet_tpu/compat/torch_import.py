"""PyTorch checkpoint <-> JAX param-tree conversion.

Required for loading the reference's released checkpoints
(ramnet_sim.pth.tar / ramnet_sim2real.pth.tar, reference README.md:56-60) into
this framework.  The reference checkpoint payload is a dict
{arch, epoch, logger, state_dict, optimizer, monitor_best, config}
(RAM_Net/base/base_trainer.py:133-158).

Because our param pytree mirrors the reference module names (see
models/statenet.py:init_params), conversion is mechanical:
  * strip the arch prefix ('statenetphasedrecurrent.' / 'unet.')
  * numeric path components index lists
  * 4-D conv weights transpose OIHW -> HWIO
  * ConvTranspose2d weights (I, O, kh, kw) -> HWIO
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

ARCH_PREFIXES = ("statenetphasedrecurrent.", "unet.")


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _convert_leaf(path: Tuple[str, ...], value: np.ndarray) -> np.ndarray:
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    if name == "weight" and value.ndim == 4:
        if parent == "transposed_conv2d":
            # torch ConvTranspose2d: (in, out, kh, kw) -> (kh, kw, in, out)
            return np.transpose(value, (2, 3, 0, 1))
        # torch Conv2d: (out, in, kh, kw) -> (kh, kw, in, out)
        return np.transpose(value, (2, 3, 1, 0))
    return value


def _insert(tree: Dict[str, Any], parts, value):
    """Insert value at a dotted path; integer components become list indices."""
    node = tree
    for i, part in enumerate(parts[:-1]):
        nxt_is_idx = parts[i + 1].isdigit()
        if part.isdigit():
            idx = int(part)
            while len(node) <= idx:
                node.append([] if nxt_is_idx else {})
            node = node[idx]
        else:
            if part not in node:
                node[part] = [] if nxt_is_idx else {}
            node = node[part]
    last = parts[-1]
    if last.isdigit():
        idx = int(last)
        while len(node) <= idx:
            node.append(None)
        node[idx] = value
    else:
        node[last] = value


def state_dict_to_params(state_dict: Mapping[str, Any],
                         dtype=np.float32) -> Dict[str, Any]:
    """Convert a reference torch state_dict to our param pytree."""
    tree: Dict[str, Any] = {}
    for full_name, tensor in state_dict.items():
        name = full_name
        for pre in ARCH_PREFIXES:
            if name.startswith(pre):
                name = name[len(pre):]
                break
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        value = _convert_leaf(tuple(parts), _to_numpy(tensor)).astype(dtype)
        _insert(tree, parts, value)
    return tree


def params_to_state_dict(params, arch: str = "ERGB2DepthRecurrent") -> Dict[str, np.ndarray]:
    """Inverse mapping, producing reference-named torch tensors (numpy)."""
    prefix = "statenetphasedrecurrent." if arch == "ERGB2DepthRecurrent" else "unet."
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (str(i),))
        else:
            value = np.asarray(node)
            name = path[-1]
            parent = path[-2] if len(path) >= 2 else ""
            if name == "weight" and value.ndim == 4:
                if parent == "transposed_conv2d":
                    value = np.transpose(value, (2, 3, 0, 1))
                else:
                    value = np.transpose(value, (3, 2, 0, 1))
            out[prefix + ".".join(path)] = value

    walk(params, ())
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth.tar checkpoint (requires torch, CPU map)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def load_params_from_checkpoint(path: str, dtype=np.float32):
    """Returns (params, config_dict_or_None) from a .pth.tar checkpoint."""
    ckpt = load_torch_checkpoint(path)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    params = state_dict_to_params(sd, dtype)
    return params, ckpt.get("config")
