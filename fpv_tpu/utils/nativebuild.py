"""Auto-build of the fpv_native C++ extension.

The extension (native/fpv_native.cc: brotli bridge + whole-frame FPV1
pipeline) is a build artifact, not a committed binary — on a fresh host it
doesn't exist and every consumer would silently fall back to the numpy +
ctypes path (correct, but ~2x slower per core on the FPV1 compat path).
``ensure_native_built()`` makes that degradation impossible in the places
that care (bench.py, tests): it builds in-place once, best-effort.
"""

from __future__ import annotations

import importlib
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent.parent


def native_available() -> bool:
    try:
        import fpv_native  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_native_built(timeout: int = 300) -> bool:
    """Build fpv_native in-place if missing.  Returns availability."""
    if native_available():
        return True
    if not (REPO / "setup.py").exists():
        return False
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=REPO,
            check=True,
            capture_output=True,
            timeout=timeout,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        return False
    importlib.invalidate_caches()
    from fpv_tpu.entropy.brotli import reload_native

    reload_native()
    return native_available()
