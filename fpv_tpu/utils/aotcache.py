"""Env-proof AOT executable cache for the fused jit entry points.

XLA's persistent compilation cache keys fold in backend compile env that
some deployment harnesses inject per session (measured in round 4: the
tunneled dev device re-compiled identical warmup geometry every process,
~200 s), silently disabling the cache.  The reference needs no warmup at
all — its pool spins up instantly (fusion_power_video.cc:1076-1084) — so
ours must cost seconds, not minutes.

This cache keys executables on data we compute OURSELVES and nothing
else:

* the entry point's name and its static argument values,
* the shapes/dtypes of its dynamic arguments,
* ``jax.__version__`` and the target device's platform + device_kind,
* a fingerprint of the installed ``fpv_tpu`` package sources (stale
  executables self-invalidate on any code change).

Serialized executables (``jax.experimental.serialize_executable``) live
under ``FPV_TPU_AOT_CACHE`` (default ``~/.cache/fpv_tpu_aot``;  set
``FPV_TPU_AOT=0`` to disable the whole layer).  A fresh process then
pays one trace + one deserialize per (geometry, flag set) instead of a
full XLA compile.

Dispatch rules (see :class:`_AotFn`):

* tracer or non-array dynamic inputs (e.g. the mesh layer's shard_map
  tracing through the entry point) bypass straight to the wrapped jit
  function — the cache only fronts concrete single-device calls;
* any serialize/deserialize/load failure marks that call key
  jit-only for the process and falls back silently (PJRT runtimes are
  not required to support executable serialization).
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import os
import pathlib
import pickle
import tempfile
import threading

import jax

_FORMAT_VERSION = 1
_USE_JIT = object()  # memo sentinel: this key is jit-only for the process


def enabled() -> bool | None:
    """Tri-state: True (forced on), False (off), None (platform default).

    The platform default is ON for accelerator backends (the deployment
    target, where warmup otherwise costs minutes behind unstable cache
    keys) and OFF for CPU: XLA:CPU deserializes some AOT executables into
    a state whose output buffers fail to materialize at fetch time
    ("Buffer Definition Event ... not found"), a loader limitation we can
    only avoid, not detect at load time.
    """
    v = os.environ.get("FPV_TPU_AOT")
    if v == "0":
        return False
    if v == "1":
        return True
    return None


def cache_dir() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "FPV_TPU_AOT_CACHE", os.path.expanduser("~/.cache/fpv_tpu_aot")
        )
    )


@functools.lru_cache(maxsize=1)
def _code_fingerprint() -> str:
    """blake2 over the package's .py sources, so any code change (which
    could change the traced program) invalidates every cached executable."""
    root = pathlib.Path(__file__).resolve().parent.parent
    h = hashlib.blake2b(digest_size=16)
    for p in sorted(root.rglob("*.py")):
        h.update(p.relative_to(root).as_posix().encode())
        h.update(p.read_bytes())
    return h.hexdigest()


@functools.lru_cache(maxsize=1)
def _cpu_fingerprint() -> str:
    """Host ISA fingerprint (flags line of /proc/cpuinfo when present)."""
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.blake2b(
                        feats.encode(), digest_size=8
                    ).hexdigest()
    except OSError:
        pass
    return platform.machine()


def _target_device(dyn_vals):
    """The device the call should execute on: where its committed inputs
    live, else the process default."""
    for v in dyn_vals:
        if isinstance(v, jax.Array):
            try:
                ds = v.devices()
            except Exception:  # noqa: BLE001 — deleted/donated arrays
                continue
            if len(ds) == 1:
                return next(iter(ds))
    dev = jax.config.jax_default_device
    return dev if dev is not None else jax.devices()[0]


class _AotFn:
    """Callable fronting a jitted function with an AOT executable cache.

    Exposes ``lower`` (delegated) so AOT/sharding callers are unaffected,
    and ``stats`` counters for tests: aot_loads (executable deserialized
    from disk), compiles (compiled here and persisted), memo_hits,
    bypasses (tracer/non-array inputs -> jit), errors.
    """

    def __init__(self, jitfn, name: str, static_argnames) -> None:
        self._jit = jitfn
        self._name = name
        self._static = frozenset(static_argnames)
        self._sig = inspect.signature(jitfn)
        self._memo: dict = {}
        self._lock = threading.Lock()
        self.stats = {
            "aot_loads": 0, "compiles": 0, "memo_hits": 0,
            "bypasses": 0, "errors": 0,
        }
        functools.update_wrapper(self, jitfn, updated=())

    # sharding/AOT callers use fn.lower(...) directly; keep that surface
    def lower(self, *args, **kwargs):
        return self._jit.lower(*args, **kwargs)

    def __call__(self, *args, **kwargs):
        on = enabled()
        if on is False:
            return self._jit(*args, **kwargs)
        try:
            bound = self._sig.bind(*args, **kwargs)
            bound.apply_defaults()
        except TypeError:
            return self._jit(*args, **kwargs)
        statics, dyn = [], []
        for nm, v in bound.arguments.items():
            (statics if nm in self._static else dyn).append((nm, v))
        for _, v in dyn:
            if (
                isinstance(v, jax.core.Tracer)
                or not hasattr(v, "shape")
                or not hasattr(v, "dtype")
            ):
                self.stats["bypasses"] += 1
                return self._jit(*args, **kwargs)
        dev = _target_device(v for _, v in dyn)
        if on is None and getattr(dev, "platform", None) == "cpu":
            return self._jit(*args, **kwargs)  # see enabled()
        key = (
            tuple(statics),
            tuple((v.shape, str(v.dtype)) for _, v in dyn),
            getattr(dev, "id", None),
            getattr(dev, "platform", None),
        )
        exe = self._memo.get(key)
        if exe is None:
            with self._lock:
                exe = self._memo.get(key)
                if exe is None:
                    exe = self._load_or_compile(bound, key, statics, dyn, dev)
                    self._memo[key] = exe
        else:
            self.stats["memo_hits"] += 1
        if exe is _USE_JIT:
            return self._jit(*args, **kwargs)
        return exe(*[v for _, v in dyn])

    def _file_key(self, key, dev) -> str:
        h = hashlib.blake2b(digest_size=20)
        h.update(_FORMAT_VERSION.to_bytes(2, "little"))
        h.update(self._name.encode())
        h.update(repr(key[:2]).encode())  # statics + avals (not device id)
        h.update(jax.__version__.encode())
        h.update(getattr(dev, "platform", "?").encode())
        h.update(getattr(dev, "device_kind", "?").encode())
        if getattr(dev, "platform", None) == "cpu":
            # XLA:CPU AOT results embed host ISA features; loading them on
            # a different machine risks SIGILL (the persistent-cache loader
            # only warns) — key CPU executables to the host's feature set
            h.update(_cpu_fingerprint().encode())
        h.update(_code_fingerprint().encode())
        return h.hexdigest()

    def _load_or_compile(self, bound, key, statics, dyn, dev):
        from jax.experimental import serialize_executable as se

        path = cache_dir() / f"{self._name}-{self._file_key(key, dev)}.aot"
        if path.exists():
            try:
                blob = pickle.loads(path.read_bytes())
                exe = se.deserialize_and_load(
                    blob["payload"], blob["in_tree"], blob["out_tree"],
                    execution_devices=[dev],
                )
                self.stats["aot_loads"] += 1
                return exe
            except Exception:  # noqa: BLE001 — stale/unsupported: recompile
                self.stats["errors"] += 1
        try:
            with jax.default_device(dev):
                compiled = self._jit.lower(
                    *bound.args, **bound.kwargs
                ).compile()
            payload, in_tree, out_tree = se.serialize(compiled)
            blob = pickle.dumps(
                {"payload": payload, "in_tree": in_tree, "out_tree": out_tree}
            )
            path.parent.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            self.stats["compiles"] += 1
            return compiled
        except Exception:  # noqa: BLE001 — runtime without serialization
            self.stats["errors"] += 1
            return _USE_JIT


def aot_dispatch(jitfn, name: str, static_argnames) -> _AotFn:
    """Front ``jitfn`` (a ``jax.jit`` object) with the AOT executable cache.

    ``static_argnames`` must repeat the names given to ``jax.jit`` — the
    dispatcher needs them to split call arguments into the executable key
    (statics) and the executable inputs (dynamics).
    """
    return _AotFn(jitfn, name, static_argnames)


def aot_jit(fn=None, *, static_argnames=(), name: str | None = None):
    """``jax.jit`` + :func:`aot_dispatch` in one decorator.

    Drop-in for ``functools.partial(jax.jit, static_argnames=...)`` at the
    definition sites of top-level-called entry points (calls traced inside
    an enclosing jit arrive as tracers and bypass to the plain jit path,
    so converting inner helpers is harmless but inert).
    """
    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)

    def deco(f):
        jf = jax.jit(f, static_argnames=static_argnames)
        return _AotFn(jf, name or f.__name__, static_argnames)

    return deco(fn) if fn is not None else deco
