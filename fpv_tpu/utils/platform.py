"""Platform-selection helper for CLI entry points.

Some hosts install an interpreter-startup hook (sitecustomize) that imports
jax and pins a TPU plugin platform before user code runs, which silently
overrides the standard ``JAX_PLATFORMS`` environment variable.  CLI tools
re-assert the env var through jax.config so ``JAX_PLATFORMS=cpu fpv-encode``
behaves as documented everywhere (tests rely on it to keep subprocesses off
tunneled devices).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax

        jax.config.update("jax_platforms", env)
    except Exception:
        pass  # backends already initialized: keep whatever is active
