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

# Build the native libs up front so the ctypes-backed tests (dataloader,
# partition) can never silently skip on a fresh checkout. `make` is a no-op
# when the .so files are current; a missing toolchain falls back to the old
# skip behavior rather than failing the whole suite.
import subprocess  # noqa: E402

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
try:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR],
        check=True,
        capture_output=True,
        timeout=120,
    )
except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
    import warnings

    warnings.warn(f"native build failed ({e}); native tests will skip")
