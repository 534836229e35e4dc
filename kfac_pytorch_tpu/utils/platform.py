"""Platform selection guard.

This environment's sitecustomize force-registers a remote TPU backend and
overrides the platform list via jax.config AFTER env parsing, so
``JAX_PLATFORMS=cpu`` in the environment is silently ignored. Entry points
call ``ensure_platform_from_env()`` to re-assert the user's env choice
(no-op when the variable is unset).
"""

from __future__ import annotations

import os


def ensure_platform_from_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)
