"""Guard the driver's two entry points (`__graft_entry__.py`).

The round driver (a) compile-checks `entry()` single-chip and (b) runs
`dryrun_multichip(8)` on a virtual 8-device mesh at the end of every
round; neither had an in-suite guard, so an API drift in the model /
inference / parallel layers would only surface at driver time.  The
conftest already forces CPU with 8 virtual devices, which is exactly the
driver's `xla_force_host_platform_device_count` setup.
"""
import pathlib
import sys

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    assert all(
        bool(jax.numpy.isfinite(x).all())
        for x in jax.tree_util.tree_leaves(out)
    )


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) == 8
    graft.dryrun_multichip(8)  # raises on any failed leg
