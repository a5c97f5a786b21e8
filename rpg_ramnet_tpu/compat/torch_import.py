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


def ordered_param_names(state_dict: Mapping[str, Any]) -> list:
    """Parameter names in torch registration order (= optimizer param-group
    index order for the reference's optim.Adam(model.parameters()),
    base_trainer.py:36-43).  Buffers (running stats) are excluded."""
    out = []
    for name in state_dict.keys():
        if name.endswith("num_batches_tracked") or ".running_" in name:
            continue
        out.append(name)
    return out


def import_torch_optimizer_state(ckpt: Mapping[str, Any], params,
                                 optimizer) -> Any:
    """Convert a reference checkpoint's torch Adam optimizer state into an
    optax opt_state for `optimizer` (the train.optim factory's chain), so
    --resume continues EXACTLY where a reference training run stopped
    (moments + step count restored; base_trainer.py:160-179 semantics).

    Mapping: torch param-group index i -> i-th parameter key of the
    checkpoint state_dict (registration order) -> our param-tree path, with
    the same OIHW->HWIO transposes as the weights themselves.
    """
    import jax.numpy as jnp
    import optax

    sd = ckpt["state_dict"]
    opt_sd = ckpt["optimizer"]
    names = ordered_param_names(sd)

    mu_flat: Dict[str, np.ndarray] = {}
    nu_flat: Dict[str, np.ndarray] = {}
    step = 0
    for idx_key, st in opt_sd["state"].items():
        i = int(idx_key)
        name = names[i]
        mu_flat[name] = _to_numpy(st["exp_avg"])
        nu_flat[name] = _to_numpy(st["exp_avg_sq"])
        sv = st["step"]
        step = max(step, int(sv) if isinstance(sv, (int, float))
                   else int(_to_numpy(sv).item()))

    mu = state_dict_to_params(mu_flat)
    nu = state_dict_to_params(nu_flat)

    opt_state = optimizer.init(params)

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(count=jnp.asarray(step, jnp.int32),
                              mu=jax.tree_util.tree_map(jnp.asarray, mu),
                              nu=jax.tree_util.tree_map(jnp.asarray, nu))
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        if hasattr(s, "_fields"):   # NamedTuple optax states
            return type(s)(*[walk(x) for x in s])
        if isinstance(s, (list, tuple)):
            return type(s)(walk(x) for x in s)
        return s

    import jax
    return walk(opt_state)


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
