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


def _local_codec_roundtrip(
    imgs: jax.Array,
    delta_high: jax.Array,
    delta_low: jax.Array,
    *,
    shift: int,
    big_endian: bool,
    chunk_len: int,
    axis: str | None,
):
    """The FULL fused codec, shard-local: model step -> device tables ->
    rANS encode kernels -> rANS decode kernels -> inverse predictors ->
    plane combine.  With ``axis`` set, histogram psums build globally-shared
    frequency tables (the one collective; everything else is per-shard —
    streams/batches are independent, matching the reference's frame-level
    data parallelism, fusion_power_video.cc:1199-1230).

    Returns (reconstructed imgs, ok) where ok aggregates the rANS state
    integrity checks, the preview roundtrip and the pixel-exact compare.
    """
    from fpv_tpu.api.fpvt_codec import (
        _apply_delta_and_combine,
        _inverse_spatial,
        _plane_geometry,
        encode_model_step,
    )
    from fpv_tpu.entropy.plane_codec import (
        _from_block_symbols,
        _to_block_symbols,
    )
    from fpv_tpu.entropy.tables_device import (
        decode_tables_device,
        encode_tables_device,
        normalize_freqs_device,
    )
    from fpv_tpu.ops import rans_pallas as rp
    from fpv_tpu.ops.rans_layout import BLOCK_COLS, BLOCK_ROWS

    b, h, w = imgs.shape
    m = encode_model_step(imgs, delta_high, delta_low, shift, big_endian)
    rec = {}
    oks = []
    for name, s in (("high", h * w), ("low", h * w),
                    ("preview", (h // 4) * (w // 4))):
        hist = m[f"hist_{name}"]
        mask = m[f"mask_{name}"]
        if axis is not None:
            hist = jax.lax.psum(hist, axis)
            # support-mask union across shards (OR via psum)
            mask = (jax.lax.psum(mask, axis) > 0).astype(jnp.int32)
        freq = normalize_freqs_device(hist, mask)
        fc, _finv = encode_tables_device(freq)
        sym_tab = decode_tables_device(freq)
        lens, nblocks = _plane_geometry(b, s, chunk_len)
        syms = _to_block_symbols(m[name].reshape(b, -1), chunk_len, nblocks)
        lens_dev = jnp.asarray(lens.reshape(nblocks, BLOCK_ROWS, BLOCK_COLS))
        states, words, counts = rp.encode_pallas(
            syms, lens_dev, fc, chunk_len, nblocks
        )
        syms2, ok = rp.decode_pallas(
            counts, states, lens_dev, sym_tab, fc,
            words.astype(jnp.uint32), chunk_len, nblocks,
        )
        rec[name] = _from_block_symbols(syms2, b, s, chunk_len)
        oks.append(jnp.all(ok == 1))
    high = _inverse_spatial(
        rec["high"].reshape(b, h, w), m["spatial"], True, True
    )
    out = _apply_delta_and_combine(
        high, rec["low"].reshape(b, h, w), m["use_delta"],
        delta_high, delta_low,
    )
    pv_ok = jnp.all(rec["preview"] == m["preview"].reshape(b, -1))
    ok_all = jnp.all(jnp.stack(oks)) & pv_ok & jnp.all(out == imgs)
    if axis is not None:
        # replicate the verdict so it is a legal replicated output
        ok_all = jax.lax.psum(ok_all.astype(jnp.int32), axis) == jax.lax.psum(
            jnp.int32(1), axis
        )
    return out, ok_all


def sharded_codec_roundtrip(
    mesh: Mesh,
    chunk_len: int = 64,
    shift: int = 0,
    big_endian: bool = False,
):
    """One jitted program running the FULL codec data-parallel over ``mesh``:
    frames shard over 'data', the rANS Pallas kernels run on per-shard
    blocks, and table histograms psum over ICI.  Returns f(imgs, dh, dl) ->
    (reconstructed imgs, ok)."""
    from jax import shard_map

    fn = functools.partial(
        _local_codec_roundtrip,
        shift=shift,
        big_endian=big_endian,
        chunk_len=chunk_len,
        axis="data",
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", None, None), P(None, None), P(None, None)),
        out_specs=(P("data", None, None), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_fused_encode(
    mesh: Mesh,
    shift: int = 0,
    big_endian: bool = False,
    chunk_len: int = 512,
    use_delta_frame: bool = True,
    low_coding: int = 0,
):
    """shard_map of the production fused_encode_batch program: each device
    encodes its local frames into independent rANS streams (shard-local
    tables and blocks).  Returns f(imgs, dh, dl) -> (small, states,
    payload_high, payload_low, payload_preview), each the concatenation of
    the per-device outputs along axis 0 — bit-identical to running
    fused_encode_batch on each device's frame slice separately (tested in
    tests/test_parallel.py).  ``low_coding=CODING_CTX16`` runs the shipping
    configuration (context-coded low plane, fpvt_codec FpvtWriter default
    for shift >= 4)."""
    from jax import shard_map

    from fpv_tpu.api.fpvt_codec import fused_encode_batch

    def fn(imgs, dh, dl):
        return fused_encode_batch(
            imgs, dh, dl, shift, big_endian, chunk_len, use_delta_frame,
            low_coding,
        )

    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", None, None), P(None, None), P(None, None)),
        out_specs=(P("data"),) * 5,
        check_vma=False,
    )
    return jax.jit(sharded)


def multichip_dryrun(n_devices: int, h: int = 32, w: int = 32) -> None:
    """Compile + execute the FULL codec (model step, device tables, rANS
    encode/decode Pallas kernels, inverse predictors) sharded over an
    ``n_devices`` mesh, and verify the roundtrip.

    Designed to run on CPU with
    ``--xla_force_host_platform_device_count=N`` (kernels run in interpret
    mode off-TPU, see rans_pallas._auto_interpret)."""
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
    step = sharded_codec_roundtrip(mesh, chunk_len=32)
    b = 2 * n_devices  # 2 frames per device
    frames = _test_frames(b, h, w)
    delta = frames[0]
    dh = (delta >> 8).astype(np.uint8)
    dl = (delta & 0xFF).astype(np.uint8)
    imgs_s = shard_frames(frames, mesh)
    out, ok = step(imgs_s, jnp.asarray(dh), jnp.asarray(dl))
    jax.block_until_ready(out)
    if not bool(ok):
        raise AssertionError("sharded full-codec roundtrip failed")
    if not np.array_equal(np.asarray(out), frames):
        raise AssertionError("sharded full-codec output mismatch")
    _dryrun_production_config(mesh, n_devices)


def _dryrun_production_config(mesh: Mesh, n_devices: int) -> None:
    """Compile + execute sharded_fused_encode in the SHIPPING configuration:
    context-coded low plane (CODING_CTX16) with chunk_len 4096 (segmented
    state carry, rans_layout SEG_LEN) — the FpvtWriter default for
    shift >= 4 — and verify bit-exactness against per-device
    fused_encode_batch runs."""
    from fpv_tpu.api.fpvt_codec import fused_encode_batch
    from fpv_tpu.ops.rans_layout import CODING_CTX16

    chunk_len = 4096
    shift = 4
    # chunk_len 4096 makes the kernels run their full 8-segment grid with
    # cross-segment state carry (the carry executes regardless of lens;
    # interpret mode iterates every step, so small frames keep the dryrun
    # bounded — content-bearing multi-segment coverage lives in
    # tests/test_rans.py's segmented-chunk tests)
    h, w = 96, 128  # hw = 12288 px; 2 frames/device
    b = 2 * n_devices
    frames = (_test_frames(b, h, w) >> 4).astype(np.uint16)  # 12-bit
    delta = frames[0]
    dh = (((delta.astype(np.uint32) << shift) >> 8) & 0xFF).astype(np.uint8)
    dl = ((delta.astype(np.uint32) << shift) & 0xFF).astype(np.uint8)
    step = sharded_fused_encode(
        mesh, shift=shift, chunk_len=chunk_len, low_coding=CODING_CTX16
    )
    imgs_s = shard_frames(frames, mesh)
    outs = step(imgs_s, jnp.asarray(dh), jnp.asarray(dl))
    jax.block_until_ready(outs)
    # bit-exactness vs a single-device run of the same per-device slice
    per = b // n_devices
    ref = fused_encode_batch(
        jnp.asarray(frames[:per]), jnp.asarray(dh), jnp.asarray(dl),
        shift, False, chunk_len, True, CODING_CTX16,
    )
    for got, want in zip(outs, ref):
        g = np.asarray(got)[: np.asarray(want).shape[0]]
        if not np.array_equal(g, np.asarray(want)):
            raise AssertionError(
                "sharded production-config encode not bit-exact"
            )


def _test_frames(b: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    return rng.integers(0, 1 << 16, size=(b, h, w), dtype=np.uint16)
