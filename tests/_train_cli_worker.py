"""Subprocess wrapper: run the trainer CLI on a forced-CPU virtual mesh.

Usage: python tests/_train_cli_worker.py <n_local_devices> <train.py argv...>

The environment pins an ``axon`` TPU backend via sitecustomize, so the CPU
platform must be forced INSIDE the process (env vars alone are silently
overridden) before jax initializes — same recipe as tests/conftest.py.  Used
by the 2-process multi-host trainer-CLI test.
"""

import os
import sys

n_local = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={n_local}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dsrg_tpu.tools.train import main  # noqa: E402

main(sys.argv[2:])
