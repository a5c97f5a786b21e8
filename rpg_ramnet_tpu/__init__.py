"""rpg_ramnet_tpu — a TPU-native JAX framework for asynchronous event+frame
monocular depth estimation (RAM-Net capabilities, re-designed TPU-first).

Capability reference: uzh-rpg/rpg_ramnet (RA-L 2021).  This is NOT a port:
the compute path is jitted JAX/XLA (NHWC, lax.scan over the asynchronous
sensor schedule, Pallas voxelization kernel), parallelism is jax.sharding
over a device Mesh, and the data pipeline emits fixed-shape padded batches
with double-buffered host->HBM prefetch.
"""

__version__ = "0.1.0"
