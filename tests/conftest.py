"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's 'fake backend' idea for multi-node-less testing
(SURVEY.md section 4): all sharding tests run on
xla_force_host_platform_device_count=8 CPU devices.

Note: the environment's axon sitecustomize pins jax_platforms to the TPU
tunnel, so an env var alone is not enough — we override at the jax.config
level before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
