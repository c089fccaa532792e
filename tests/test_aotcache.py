"""Env-proof AOT executable cache (utils/aotcache).

The XLA persistent cache can be silently disabled by deployment
harnesses that inject per-session compile env into its keys (measured in
round 4, docs/ROUND4.md).  The AOT layer keys executables on
self-computed data only, so a fresh process must LOAD the fused
entry-point executables a previous process serialized — no XLA compile —
and produce identical pixels.
"""

import functools
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = pathlib.Path(__file__).resolve().parent / "aot_worker.py"


def _run(env) -> dict:
    p = subprocess.run(
        [sys.executable, str(WORKER)], capture_output=True, text=True,
        timeout=600, cwd=REPO, env=env,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    out = {}
    for line in p.stdout.splitlines():
        if line.startswith(("DIGEST", "ENC_STATS", "DEC_STATS")):
            k, v = line.split(None, 1)
            out[k] = v
    assert set(out) == {"DIGEST", "ENC_STATS", "DEC_STATS"}, p.stdout
    return out


def test_fresh_process_loads_serialized_executables(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["FPV_TPU_AOT_CACHE"] = str(tmp_path / "aot")
    first = _run(env)
    enc1 = json.loads(first["ENC_STATS"])
    assert enc1["compiles"] >= 1 and enc1["aot_loads"] == 0, enc1
    files = list((tmp_path / "aot").glob("*.aot"))
    assert files, "AOT cache wrote nothing"
    second = _run(env)
    enc2 = json.loads(second["ENC_STATS"])
    dec2 = json.loads(second["DEC_STATS"])
    assert enc2["aot_loads"] >= 1 and enc2["compiles"] == 0, enc2
    assert dec2["aot_loads"] >= 1 and dec2["compiles"] == 0, dec2
    assert first["DIGEST"] == second["DIGEST"]


def test_dispatch_mid_signature_statics_and_tracer_bypass(tmp_path, monkeypatch):
    """The dispatcher splits statics out of ANY signature position, returns
    bit-identical results, and bypasses to jit under tracing (the mesh
    layer's shard_map traces through the wrapped entry points)."""
    monkeypatch.setenv("FPV_TPU_AOT_CACHE", str(tmp_path / "aot"))
    monkeypatch.setenv("FPV_TPU_AOT", "1")  # platform default is off on CPU
    import jax
    import jax.numpy as jnp

    from fpv_tpu.utils import aotcache

    @functools.partial(jax.jit, static_argnames=("k", "flag"))
    def f(x, k, y, flag=False):
        out = x * k + y
        return (out, out.sum()) if flag else (out, jnp.zeros(()))

    g = aotcache.aot_dispatch(f, "toyf", ("k", "flag"))
    x = jnp.arange(8.0)
    y = jnp.ones(8)
    want = f(x, 3, y, flag=True)
    got = g(x, 3, y, flag=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    g(x, 3, y, flag=True)
    assert g.stats["memo_hits"] == 1 and g.stats["compiles"] == 1, g.stats

    # under an enclosing jit the inputs are tracers -> plain jit path
    val = jax.jit(lambda x: g(x, 3, y, flag=True)[1])(x)
    assert float(val) == float(want[1])
    assert g.stats["bypasses"] >= 1, g.stats

    # different static value -> different executable, not a stale hit
    got2 = g(x, 5, y, flag=False)
    np.testing.assert_array_equal(
        np.asarray(got2[0]), np.asarray(x * 5 + y)
    )
    assert g.stats["compiles"] == 2, g.stats


def test_disabled_env_bypasses_everything(tmp_path, monkeypatch):
    monkeypatch.setenv("FPV_TPU_AOT", "0")
    monkeypatch.setenv("FPV_TPU_AOT_CACHE", str(tmp_path / "aot"))
    import jax.numpy as jnp

    from fpv_tpu.utils import aotcache

    g = aotcache.aot_dispatch(
        __import__("jax").jit(lambda x: x + 1), "inc", ()
    )
    assert float(g(jnp.ones(()))) == 2.0
    assert not (tmp_path / "aot").exists()
    assert g.stats["compiles"] == 0 and g.stats["aot_loads"] == 0
