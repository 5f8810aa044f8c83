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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 virtual devices share 2 physical cores here: heavy per-device
    # programs can reach a collective tens of seconds apart, and XLA-CPU
    # hard-aborts the process when a rendezvous waits > 40 s.  Raise the
    # terminate timeout so oversubscription can't kill the suite.
    _flags = (_flags +
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
