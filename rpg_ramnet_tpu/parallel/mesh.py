"""Device mesh + sharding rules.

The reference is strictly single-device (SURVEY.md §2.5: no DDP, no
torch.distributed anywhere).  This module is the TPU-native scaling layer it
lacks: a Mesh over ICI with a 'data' axis (DP) and a reserved 'model' axis,
batch-sharded inputs, replicated params.  XLA inserts the gradient
all-reduce (psum over 'data') automatically from the sharding annotations —
the collectives ARE the comm backend on TPU.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = cfg.model if cfg else 1
    data = cfg.data if cfg else -1
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


# keys stored time-leading by train.sequence_loss.pack_train_batch and the
# chunked-streaming chunk loaders: the batch/lane dim is axis 1 there
TIME_LEADING_KEYS = ("events_tcf", "image_tcf", "depth_events_t",
                     "depth_image_t", "times_events_t", "times_image_t",
                     "reset_t")


def key_sharding(mesh: Mesh, key: str) -> NamedSharding:
    if key in TIME_LEADING_KEYS:
        return NamedSharding(mesh, P(None, DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch with per-key batch-dim sharding (dim 0, or
    dim 1 for time-leading packed keys)."""
    if isinstance(batch, dict):
        return {k: jax.device_put(v, key_sharding(mesh, k))
                for k, v in batch.items()}
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
