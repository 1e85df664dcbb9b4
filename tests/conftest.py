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


# The full suite segfaults nondeterministically late in the run (observed
# at 68-94%, always inside interpret-mode device-engine tests that
# allocate large buffers) while every crashing test passes in isolation —
# the signature of accumulated XLA-CPU executable/buffer growth. Clearing
# jax's caches after those modules bounds process RSS at the cost of a few
# recompiles. Scoped to modules marked `slow` (the interpret-mode/device
# tier, where the growth happens) so the fast tier keeps its compile
# cache across modules.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules(request):
    yield
    marks = getattr(request.module, "pytestmark", [])
    if not isinstance(marks, (list, tuple)):
        marks = [marks]
    if any(getattr(m, "name", None) == "slow" for m in marks):
        jax.clear_caches()
        gc.collect()
