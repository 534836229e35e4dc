"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; distributed semantics are
validated on XLA's host-platform device simulation (the same SPMD programs
run unchanged on a real TPU mesh).

Note: the ambient environment registers a remote single-chip TPU backend
("axon") from sitecustomize and forces ``jax_platforms=axon,cpu`` via
jax.config — env vars alone cannot override it, so we re-force the config
here before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
