"""Test configuration: run everything on a virtual 8-device CPU mesh with
64-bit types enabled, so reference-derived statistical thresholds apply
directly and multi-device sharding is exercised without TPU hardware.

Note: this environment pre-imports jax via sitecustomize (TPU plugin
registration), so plain env vars are too late -- jax.config.update still
works because no backend has been initialised at conftest import time.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
