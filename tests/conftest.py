"""Test configuration.

Default lane: force JAX onto a virtual 8-device CPU platform so
sharding/pjit tests run fast and without TPU hardware. The axon TPU plugin
registers itself at interpreter start and REWRITES the platform selection
to ``"axon,cpu"`` (overriding any ``JAX_PLATFORMS`` env value), so the
CPU lane must re-pin ``jax_platforms="cpu"`` AFTER import — otherwise the
first ``jax.devices()`` initializes the axon PJRT client, which needs a
live TPU tunnel (and hangs the whole suite when the tunnel is down).

On-device lane (VERDICT r2 item 6): ``RSTPU_TPU_TESTS=1`` skips the CPU
pin so the numeric suites (frontend, Pallas MFCC non-interpret, decoder,
frontier, i-vector, ...) run on the real chip — run a subset, e.g.::

    RSTPU_TPU_TESTS=1 python -m pytest tests/test_decoder.py -q

Multi-device (mesh) tests auto-skip on a single-chip lane via the
``needs_multidevice`` helper below.
"""

import os
import sys

TPU_TESTS = bool(os.environ.get("RSTPU_TPU_TESTS"))

if not TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if TPU_TESTS:
    _tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not _tpus:
        raise RuntimeError(
            "RSTPU_TPU_TESTS=1 but no TPU device is visible"
        )
    jax.config.update("jax_default_device", _tpus[0])
else:
    # The env var alone is NOT enough: the axon plugin's register() (run
    # from sitecustomize at interpreter start) resets the selection to
    # "axon,cpu". Re-pinning here keeps jax.devices() off the tunnel.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def pytest_collection_modifyitems(config, items):
    """On the TPU lane, skip tests that need the virtual 8-CPU mesh."""
    if not TPU_TESTS:
        return
    import pytest

    n = len([d for d in jax.devices() if d.platform == "tpu"])
    skip = pytest.mark.skip(
        reason="needs a multi-device mesh (single-chip TPU lane)"
    )
    for item in items:
        name = item.nodeid
        if n < 2 and (
            "parallel" in name or "multichip" in name or "mesh" in name
        ):
            item.add_marker(skip)
