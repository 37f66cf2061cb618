"""Driver entry-point smoke tests.

Regression guard for MULTICHIP_r01: the driver invokes
``dryrun_multichip(8)`` in an environment whose sitecustomize pins a
single-device TPU backend, so the function must re-exec itself into a child
that forces the virtual CPU mesh (tests/conftest.py recipe) rather than
assert on ``len(jax.devices())``.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp

import pytest

# e2e/subprocess/distributed tier (VERDICT r2 item 6): excluded from the
# fast core gate via `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 21
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_dryrun_multichip_in_process():
    """Under the pytest 8-device CPU mesh the in-process path runs.

    Toy geometry: this test guards the mechanism (in-process dispatch, padded
    uneven batch 5->8, sharded step, DP inference); the driver's production
    geometry (batch 20 @ 321²x21, the default) is covered by the
    MULTICHIP_r* artifact itself and by test_dp_production."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    g.dryrun_multichip(4, geometry="toy")


def test_dryrun_multichip_single_device_fallback():
    """Driver scenario: the invoking interpreter sees ONE device.

    We simulate it with a child whose env pins JAX_PLATFORMS=cpu but has no
    xla_force_host_platform_device_count flag -> 1 CPU device, same count as
    the driver's axon backend. dryrun_multichip(8) must still succeed by
    re-exec'ing with the forced virtual mesh.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8, geometry='toy')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout
