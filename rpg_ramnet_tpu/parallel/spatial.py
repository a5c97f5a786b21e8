"""Spatial partitioning (the conv-net analog of sequence parallelism).

No reference counterpart (single GPU).  For latency-bound single-stream
inference (or very large frames), the H dimension of activations and
recurrent state is sharded over the mesh 'model' axis; GSPMD inserts the
halo exchanges for the convolutions automatically.  Composes with data
parallelism on the 'data' axis (batch dim).

Shardings (NHWC):
  inputs  'image'  [B, H, W, C]    -> P('data', 'model')
          'events' [B, K, H, W, C] -> P('data', None, 'model')
  state   per-scale [B, h, w, c]   -> P('data', 'model')
  params  replicated
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def spatial_pkg_sharding(mesh: Mesh, key: str) -> NamedSharding:
    if key == "events":
        return NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))
    if key == "image":
        return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    if key.startswith("times"):
        return NamedSharding(mesh, P(DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_package_spatial(pkg, mesh: Mesh):
    """Place a datapackage {'events': [B,K,H,W,C], 'image': [B,H,W,C], ...}
    with H sharded over 'model' and batch over 'data'."""
    return {k: jax.device_put(v, spatial_pkg_sharding(mesh, k))
            for k, v in pkg.items()}


def shard_state_spatial(state, mesh: Mesh):
    """Recurrent state leaves are [B, h, w, c] pyramids -> H over 'model'."""
    s = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), state)
