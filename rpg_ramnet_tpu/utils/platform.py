"""Platform selection helper.

Some environments register a TPU PJRT plugin at interpreter start and force
the platform regardless of the JAX_PLATFORMS environment variable.  Calling
`ensure_platform()` after importing jax restores standard behavior: if the
user asked for a platform via JAX_PLATFORMS (e.g. 'cpu' for host-side tests),
honor it.
"""
from __future__ import annotations

import os


def ensure_platform(default: str | None = None) -> str:
    import jax
    want = os.environ.get("JAX_PLATFORMS") or default
    if want and want not in ("axon",):
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    return jax.default_backend()
