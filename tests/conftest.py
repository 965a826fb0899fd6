"""Test configuration.

Force JAX onto a virtual 8-device CPU platform so sharding/pjit tests run
fast and without TPU hardware. The axon TPU plugin registers itself even
when ``JAX_PLATFORMS=cpu`` is set, so the default device must also be pinned
to CPU explicitly after import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
