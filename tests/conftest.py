"""Test configuration: force CPU with a virtual 8-device mesh, so sharding
tests run without TPU hardware (the JAX-idiomatic way to test multi-chip
programs; see SURVEY.md §4).

Note: this environment registers a TPU PJRT plugin via sitecustomize before
user code runs, so JAX_PLATFORMS env alone is not enough — we must also flip
the already-imported jax config to cpu.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# parity tests compare against torch float32; keep matmuls at full precision
jax.config.update("jax_default_matmul_precision", "highest")
