"""Multi-chip scaling: device meshes and sharded codec steps.

The reference's parallelism is a worker-thread pool over frames
(fusion_power_video.cc:1199-1230).  The TPU-native equivalent is data
parallelism over a device mesh: frames shard over the ``data`` axis and,
for very large frames, rows shard over the ``space`` axis.  XLA/GSPMD
inserts the collectives (histogram psums ride ICI; halo exchanges for the
preview/prediction rolls are nearest-neighbor permutes).

Streams are independent — there is no cross-replica dependency in the codec
itself — so scaling efficiency is near-linear; only the (tiny) histogram
reductions cross shards.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None, space: int = 1
) -> Mesh:
    """Build a (data, space) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if data is None:
        data = n_devices // space
    grid = np.array(devs[: data * space]).reshape(data, space)
    return Mesh(grid, axis_names=("data", "space"))


def shard_frames(imgs: jax.Array | np.ndarray, mesh: Mesh) -> jax.Array:
    """Place [B, H, W] frames with B over 'data' and H over 'space'."""
    sharding = NamedSharding(mesh, P("data", "space", None))
    return jax.device_put(jnp.asarray(imgs), sharding)


def sharded_encode_model_step(mesh: Mesh, shift: int = 0, big_endian: bool = False):
    """Returns a jitted model step that runs sharded over ``mesh``.

    The returned function takes ([B,H,W] u16, delta_high, delta_low) and
    produces the same outputs as fpv_tpu.api.fpvt_codec.encode_model_step;
    GSPMD partitions the batch over 'data' and rows over 'space'.
    """
    from fpv_tpu.api.fpvt_codec import encode_model_step

    in_shardings = (
        NamedSharding(mesh, P("data", "space", None)),
        NamedSharding(mesh, P("space", None)),
        NamedSharding(mesh, P("space", None)),
    )

    @functools.partial(jax.jit, in_shardings=in_shardings)
    def step(imgs, delta_high, delta_low):
        return encode_model_step(imgs, delta_high, delta_low, shift, big_endian)

    return step


def sharded_roundtrip_step(mesh: Mesh, chunk_len: int = 256):
    """A full sharded encode->decode step (prediction + rANS + inverse).

    Used by the multi-chip dry run: exercises every collective the codec
    needs (hist psum, halo rolls, sharded chunk scans) in one jitted program.
    Returns (fn, make_example_args).
    """
    from fpv_tpu.ops.planes import combine_planes, split_planes
    from fpv_tpu.ops.predict import (
        cg2d_decode,
        cg2d_encode,
        delta_decode,
        delta_encode,
    )
    from fpv_tpu.ops.preview import generate_preview
    from fpv_tpu.ops.heuristics import histogram256

    data_sh = NamedSharding(mesh, P("data", None, None))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(data_sh, rep, rep))
    def step(imgs, delta_high, delta_low):
        high, low, nonzero_low = split_planes(imgs, 0, False)
        pv = generate_preview(high)
        dh = delta_encode(high, delta_high[None])
        res = cg2d_encode(dh)
        hist = histogram256(res)
        # inverse path (decode): wavefront + delta add + combine
        back = cg2d_decode(res)
        rec_high = delta_decode(back, delta_high[None])
        rec = combine_planes(rec_high, low)
        ok = jnp.all(rec == imgs)
        return res, pv, hist, ok

    return step


def multichip_dryrun(n_devices: int, h: int = 32, w: int = 32) -> None:
    """Compile + execute one sharded step over an ``n_devices`` mesh.

    Raises if the sharded program fails to compile or produces a wrong
    roundtrip. Designed to run on CPU with
    ``--xla_force_host_platform_device_count=N``.
    """
    if len(jax.devices()) < n_devices and os.environ.get("FPV_TPU_DRYRUN") != "1":
        # Not enough devices on the current platform (e.g. a single real TPU
        # chip, or a backend pre-initialized by site hooks): re-exec in a
        # clean subprocess with a virtual CPU mesh.
        import subprocess
        import sys

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(n_devices, 8)}"
        ).strip()
        env["FPV_TPU_DRYRUN"] = "1"
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from fpv_tpu.parallel.mesh import multichip_dryrun;"
            f"multichip_dryrun({n_devices}, {h}, {w})"
        )
        subprocess.run([sys.executable, "-c", code], env=env, check=True)
        return
    mesh = make_mesh(n_devices)
    step = sharded_roundtrip_step(mesh)
    b = max(2 * n_devices, n_devices)  # at least 2 frames per device
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 1 << 16, size=(b, h, w), dtype=np.uint16)
    delta = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
    dh = (delta >> 8).astype(np.uint8)
    dl = (delta & 0xFF).astype(np.uint8)
    imgs_s = shard_frames(imgs, mesh)
    res, pv, hist, ok = step(imgs_s, jnp.asarray(dh), jnp.asarray(dl))
    jax.block_until_ready(res)
    if not bool(ok):
        raise AssertionError("sharded roundtrip mismatch")
    assert int(jnp.sum(hist)) == b * h * w
