"""Driver-contract guard: __graft_entry__.entry() must stay traceable and
dryrun_multichip must execute a full sharded train step on the virtual
8-device CPU mesh (conftest.py sets xla_force_host_platform_device_count=8).
These are exactly what the round driver runs; regressions here would fail
the round even with the rest of the suite green."""
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_traces():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # Abstract evaluation runs the full trace (shape/dtype checks, all
    # flax module plumbing) without paying flagship-shape CPU compile time.
    out = jax.eval_shape(fn, *args)
    rgb, depth = out
    # rgb stacks the render views' reprojected colors: (..., n_views*3)
    assert rgb.shape[-1] % 3 == 0 and rgb.shape[-1] > 0
    assert depth.ndim >= 2


def test_dryrun_multichip_executes():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
