"""Benchmark harness: FPVT encode throughput on the attached accelerator.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the compiled reference encoder (google/fusion-power-video,
multithreaded brotli-q1 path) on this host's CPU, measured live when the
binary is available (rebuilt on demand), else the recorded measurement from
BASELINE.md protocol runs on this box.

Like the reference's benchmark.cc, this harness is also a roundtrip test:
every encoded batch is decoded and byte-compared before times are reported.
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
REFBIN = REPO / ".refbin" / "ref_benchmark"
RECORDED_BASELINE_MPS = 43.98  # ref_benchmark, this box, 32x1024x1024 12-bit

# benchmark configuration (mirrors the BASELINE.json corpus shape)
FRAMES, H, W, BITS, SHIFT = 128, 1024, 1024, 12, 4
BATCH = 128


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _build_ref_tool(tool_cc: str, out: pathlib.Path) -> pathlib.Path | None:
    """Compile one reference tool (fusion_power_video.cc + tool_cc)."""
    if out.exists():
        return out
    src = pathlib.Path("/root/reference")
    if not src.exists():
        return None
    out.parent.mkdir(exist_ok=True)
    cmd = (
        f"g++ -O3 -std=c++14 -I{REPO}/native/brotli_shim "
        f"{src}/fusion_power_video.cc {src}/{tool_cc} "
        "-l:libbrotlienc.so.1 -l:libbrotlidec.so.1 -l:libbrotlicommon.so.1 "
        f"-lpthread -o {out}"
    )
    try:
        subprocess.run(cmd, shell=True, check=True, capture_output=True)
        return out
    except subprocess.CalledProcessError:
        return None


def build_reference() -> pathlib.Path | None:
    return _build_ref_tool("benchmark.cc", REFBIN)


def measure_reference(raw_path: str) -> float | None:
    binpath = build_reference()
    if binpath is None:
        return None
    try:
        out = subprocess.run(
            [str(binpath), raw_path, str(W), str(H), "0", str(SHIFT),
             str(FRAMES), "4"],
            capture_output=True, text=True, timeout=600, check=True,
        ).stderr
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    for line in out.splitlines():
        if line.startswith("total") and "speed:" in line:
            return float(line.split("speed:")[1].split("MP/s")[0])
    return None


def _accelerator_alive(timeout_s: float = 180.0) -> str | None:
    """Probe the attached accelerator with a watchdog.

    Tunneled devices can become unreachable mid-session; backend init then
    blocks FOREVER inside the first device op (not at import).  A daemon
    probe thread bounds that: on failure the harness reports an explicit
    environment error instead of hanging until the driver kills it.
    Returns None when alive, else a description of what failed."""
    import threading

    result: list[str | None] = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            np.asarray(jnp.arange(8).sum())
            result.append(None)
        except Exception as e:  # pragma: no cover - env-dependent
            result.append(f"device probe raised {type(e).__name__}: {e}")

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        return f"device backend init hung (no response in {timeout_s:.0f}s)"
    return result[0]


def _accelerator_alive_retrying(
    attempts: int = 4, spacing_s: float = 60.0
) -> str | None:
    """Subprocess probes with retries, then the in-process watchdog.

    A flapping tunnel can recover between attempts, but a HUNG backend
    init poisons the process forever (the init lock never releases), so
    retries only make sense in fresh subprocesses; the parent touches jax
    only after a clean subprocess probe.  FPV_TPU_BENCH_PROBE_RETRIES
    overrides the attempt count."""
    attempts = int(os.environ.get("FPV_TPU_BENCH_PROBE_RETRIES", attempts))
    code = ("import numpy, jax, jax.numpy as jnp; "
            "numpy.asarray(jnp.arange(8).sum())")
    last = "no probe ran"
    for i in range(max(1, attempts)):
        if i:
            log(f"accelerator probe retry {i + 1}/{attempts} "
                f"in {spacing_s:.0f}s ({last})")
            time.sleep(spacing_s)
        try:
            p = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, timeout=180,
            )
        except subprocess.TimeoutExpired:
            last = "device backend init hung (subprocess probe, 180s)"
            continue
        if p.returncode == 0:
            # device answered in a clean process: safe for THIS process
            # to init the backend (watchdog still guards a mid-run flap)
            return _accelerator_alive()
        last = (f"device probe exited rc={p.returncode}: "
                f"{p.stderr.decode()[-200:]}")
    return last


def main() -> None:
    env_error = _accelerator_alive_retrying()
    if env_error is not None and "no response" in env_error:
        # the SUBPROCESS probe answered but THIS process's backend init
        # hung: a handshake race that poisons the process (the init lock
        # never releases), observed on the tunneled device.  The device is
        # demonstrably reachable, so re-exec the bench in a fresh process
        # instead of reporting an environment failure.  Bounded: each exec
        # increments FPV_TPU_BENCH_EXECS.
        execs = int(os.environ.get("FPV_TPU_BENCH_EXECS", "0"))
        if execs < 3:
            log(f"in-process init hung after a clean subprocess probe; "
                f"re-exec {execs + 1}/3")
            os.environ["FPV_TPU_BENCH_EXECS"] = str(execs + 1)
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
    if env_error is not None:
        log(f"FATAL: accelerator unreachable - no capture ({env_error})")
        # distinct metric name: a consumer keying on the throughput metric
        # must not record a fake 0 Mpix/s datapoint for an env failure
        print(json.dumps({
            "metric": "bench_environment_failure",
            "value": 0,
            "unit": "none",
            "vs_baseline": 0,
            "error": env_error + "; environment failure, not a codec "
                     "regression - rerun when the accelerator is back",
        }))
        return

    # build the native extension if this is a fresh host (otherwise the
    # FPV1 compat path silently measures the ~2x-slower ctypes fallback)
    from fpv_tpu.utils.nativebuild import ensure_native_built

    if not ensure_native_built():
        log("WARNING: fpv_native unavailable; FPV1 uses ctypes fallback")

    from fpv_tpu.api.fpvt_codec import FpvtWriter, decode_file_fpvt
    from fpv_tpu.utils import testdata

    log(f"corpus: {FRAMES}x{H}x{W} {BITS}-bit plasma")
    frames = testdata.plasma_frames(FRAMES, H, W, bits=BITS, seed=1)
    raw_path = "/tmp/fpv_bench_corpus.raw"
    with open(raw_path, "wb") as f:
        f.write(testdata.to_raw_bytes(frames))

    ref_mps = measure_reference(raw_path)
    if ref_mps is None:
        ref_mps = RECORDED_BASELINE_MPS
        log(f"reference binary unavailable; recorded baseline {ref_mps} MP/s")
    else:
        log(f"reference (live): {ref_mps:.1f} MP/s encode")

    npix = frames.size
    mb = frames.nbytes / 1e6

    # warm the host<->device transfer path (first transfer in a process can
    # pay a large one-time setup cost on tunneled devices)
    import jax
    import jax.numpy as jnp

    _ = np.asarray(jnp.asarray(np.ones(256, np.uint8)) + 1)

    # ---- link-bandwidth probe: the host<->device path on this dev harness
    # is an RPC tunnel whose rate drifts 2-3x between sessions; measuring it
    # IN the same session lets the e2e numbers be decomposed into codec time
    # vs link time (the JSON carries both, so a reader can attribute a slow
    # e2e capture to the link with evidence).  32 MB 2-D u8 arrays — the
    # tunnel client's rate is shape-sensitive (flat 1-D pulls ~4x slower).
    probe = np.zeros((16384, 2048), np.uint8)
    probe_mb = probe.nbytes / 1e6
    ups, downs = [], []
    dev_probe = jax.block_until_ready(jnp.asarray(probe))  # setup cost out
    for _ in range(3):
        t0 = time.time()
        dev_probe = jax.block_until_ready(jnp.asarray(probe))
        ups.append(time.time() - t0)
        t0 = time.time()
        np.asarray(dev_probe)
        downs.append(time.time() - t0)
    link_up = probe_mb / statistics.median(ups)
    link_down = probe_mb / statistics.median(downs)
    del dev_probe, probe
    log(f"link probe: up {link_up:.1f} MB/s, down {link_down:.1f} MB/s "
        "(median of 3)")

    # shape-matched link probes: the tunnel's rate is SHAPE-sensitive
    # (flat 1-D moves ~4x slower than 2-D tiles), and the codec's real
    # transfers are (a) u16 frame batches up, (b) 1-D u16 payloads up/down,
    # (c) [B,H,W,2] u8 packed frames down.  Modeling each leg at the rate
    # of ITS OWN shape is what makes the e2e model track the measurement
    # across tunnel drift (docs/E2E_MODEL.md).
    def _rate(arr: np.ndarray, n: int = 3) -> tuple[float, float]:
        dev = jax.block_until_ready(jnp.asarray(arr))  # setup out
        u, d = [], []
        for _ in range(n):
            t0 = time.time()
            dev = jax.block_until_ready(jnp.asarray(arr))
            u.append(time.time() - t0)
            t0 = time.time()
            np.asarray(dev)
            d.append(time.time() - t0)
        mbs = arr.nbytes / 1e6
        return mbs / statistics.median(u), mbs / statistics.median(d)

    up_frames, _ = _rate(np.zeros((32, H, W), np.uint16))
    up_1d, down_1d = _rate(np.zeros(16 << 20, np.uint16))
    _, down_imgs = _rate(np.zeros((32, H, W, 2), np.uint8))
    log(f"shape-matched link: frames-up {up_frames:.1f}, payload-1d "
        f"up {up_1d:.1f} / down {down_1d:.1f}, imgs-down {down_imgs:.1f} "
        "MB/s")

    from concurrent.futures import ThreadPoolExecutor

    def encode_once() -> bytes:
        w = FpvtWriter(W, H, shift=SHIFT, frames_per_batch=BATCH)
        parts = [w.init(frames[0])]
        starts = list(range(0, FRAMES, BATCH))
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [
                pool.submit(w.encode_batch_bytes, frames[s : s + BATCH])
                for s in starts
            ]
            for s, f in zip(starts, futs):
                parts.append(w.add_batch(f.result(), min(BATCH, FRAMES - s)))
        parts.append(w.finish())
        return b"".join(parts)

    # warmup (compile)
    t0 = time.time()
    data = encode_once()
    log(f"warmup encode (incl. compile): {time.time()-t0:.1f}s, "
        f"{len(data)} bytes ({8*len(data)/npix:.3f} bpp, "
        f"{frames.nbytes/len(data):.2f}x)")

    # roundtrip verification (harness doubles as correctness test)
    t0 = time.time()
    decoded = decode_file_fpvt(data)
    dec_warm = time.time() - t0
    if not (decoded == (frames.astype(np.uint16) << SHIFT)).all():
        print(json.dumps({"metric": "fpvt_encode_throughput", "value": 0,
                          "unit": "Mpix/s", "vs_baseline": 0,
                          "error": "roundtrip mismatch"}))
        sys.exit(1)
    log(f"roundtrip verified; warmup decode {dec_warm:.1f}s")

    # ---- end-to-end (host->host) throughput. NOTE: on this dev harness the
    # device is behind a ~45 MB/s RPC tunnel, so e2e is link-bound; real TPU
    # hosts attach over PCIe (>16 GB/s) where the device numbers dominate.
    # Tunnel-crossing numbers use MEDIAN of 3 (the tunnel's rate drifts; a
    # single lucky/unlucky capture should not be the shipping number).
    times = []
    for _ in range(3):
        t0 = time.time()
        encode_once()
        times.append(time.time() - t0)
    e2e_enc = npix / 1e6 / statistics.median(times)

    # phase decomposition of one e2e encode: where the wall time actually
    # goes (upload / fused device program / packaging incl. payload pulls /
    # host serialize).  The r4+r5 captures both measured e2e encode at
    # 0.44x the link+codec model across a 2x link-rate change — this pins
    # the unmodeled constant-factor cost (docs/E2E_MODEL.md).
    e2e_enc_phases = None
    try:
        # NOTE: fused_encode_batch must be imported HERE — the later
        # section-local `from ... import fused_encode_batch` makes the name
        # function-local everywhere, so an unimported use above it raises
        # UnboundLocalError (this section silently logged that failure in
        # the r5 interim captures)
        from fpv_tpu.api.fpvt_codec import fused_encode_batch
        from fpv_tpu.api.fpvt_codec import FpvtWriter as _FW

        w_d = _FW(W, H, shift=SHIFT, frames_per_batch=BATCH)
        w_d.init(frames[0])
        t0 = time.time()
        up_d = jax.block_until_ready(jnp.asarray(frames[:BATCH]))
        t_up = time.time() - t0
        t0 = time.time()
        outs_d = fused_encode_batch(
            up_d, w_d._delta_high, w_d._delta_low, SHIFT, False,
            w_d._chunk_len, low_coding=w_d._low_coding, allow_prev=True,
        )
        jax.block_until_ready(outs_d)
        t_dev = time.time() - t0
        from fpv_tpu.api.fpvt_codec import package_encoded_batch as _pkg

        t0 = time.time()
        flags_d, streams_d = _pkg(
            np.asarray(outs_d[0]), np.asarray(outs_d[1]), *outs_d[2:],
            b=BATCH, h=H, w=W, chunk_len=w_d._chunk_len,
            low_coding=w_d._low_coding,
        )
        t_pkg = time.time() - t0
        from fpv_tpu.format import fpvt as _fpvt

        t0 = time.time()
        _fpvt.serialize_batch_section(
            flags_d, np.full(BATCH, -1, np.int64), *streams_d
        )
        t_ser = time.time() - t0
        e2e_enc_phases = {
            "upload_s": round(t_up, 3), "device_s": round(t_dev, 3),
            "package_s": round(t_pkg, 3), "serialize_s": round(t_ser, 3),
        }
        log(f"e2e encode phases: upload {t_up:.2f}s, device {t_dev:.2f}s, "
            f"package(+pulls) {t_pkg:.2f}s, serialize {t_ser:.2f}s "
            f"(sum {t_up+t_dev+t_pkg+t_ser:.2f}s vs measured "
            f"{statistics.median(times):.2f}s)")
        del up_d, outs_d
    except Exception as e:  # noqa: BLE001 — keep the main bench alive
        log(f"e2e decomposition failed: {e}")

    times = []
    for _ in range(3):
        t0 = time.time()
        decode_file_fpvt(data)
        times.append(time.time() - t0)
    e2e_dec = npix / 1e6 / statistics.median(times)

    # ---- FPV1 compat path (byte-exact reference format): whole-frame
    # native pipeline (split+heuristics+prediction+brotli in one C call,
    # native/fpv_native.cc) on the same host CPU the reference uses.
    # Measured like every other metric: best-of-3 over >=64 frames, with
    # the threaded encoder (4 workers, matching the reference's 4 threads
    # above).
    import fpv_tpu

    sub = frames[:64]
    fpv1_data = fpv_tpu.encode_file(sub, shift=SHIFT, num_threads=4)
    fpv1_times = []
    for _ in range(3):
        t0 = time.time()
        fpv_tpu.encode_file(sub, shift=SHIFT, num_threads=4)
        fpv1_times.append(time.time() - t0)
    fpv1_mps = sub.size / 1e6 / min(fpv1_times)
    fpv1_ok = bool(
        (fpv_tpu.decode_file(fpv1_data) >> SHIFT == sub).all()
    )
    fpv1_dec_times = []
    for _ in range(3):
        t0 = time.time()
        fpv_tpu.decode_file(fpv1_data, num_threads=4)
        fpv1_dec_times.append(time.time() - t0)
    fpv1_dec_mps = sub.size / 1e6 / min(fpv1_dec_times)
    log(f"FPV1 compat encode (native, byte-exact): {fpv1_mps:.1f} MP/s "
        f"({8*len(fpv1_data)/sub.size:.3f} bpp, roundtrip {'ok' if fpv1_ok else 'FAIL'})"
        f" vs reference {ref_mps:.1f} MP/s; decode {fpv1_dec_mps:.1f} MP/s"
        " (threaded; reference decoders are single-threaded)")

    # ---- device-resident codec throughput: frames pre-staged in HBM,
    # compressed stream left in HBM (the production serving scenario; the
    # reference's own numbers likewise exclude disk I/O).  Host work that is
    # intrinsic to the codec (table normalization from device histograms,
    # per-block counts) stays inside the timed region.
    w0 = FpvtWriter(W, H, shift=SHIFT, frames_per_batch=BATCH)
    w0.init(frames[0])
    imgs_dev = jnp.asarray(frames[:BATCH])
    jax.block_until_ready(imgs_dev)
    chunk_len = 1 << w0.header.chunk_log2

    from fpv_tpu.api.fpvt_codec import fused_encode_batch, _small_layout

    lay = _small_layout(BATCH, H, W, chunk_len, w0._low_coding)

    def _reduce_all(out):
        return sum(jnp.sum(x.astype(jnp.uint32)) for x in out)

    @jax.jit
    def _enc_chain1(im):
        return _reduce_all(
            fused_encode_batch(im, w0._delta_high, w0._delta_low, SHIFT,
                               False, chunk_len, low_coding=w0._low_coding,
                               allow_prev=True)
        )

    @jax.jit
    def _enc_chain3(im):
        acc = jnp.uint32(0)
        for i in range(3):
            acc = acc + _reduce_all(
                fused_encode_batch(im ^ jnp.uint16(i), w0._delta_high,
                                   w0._delta_low, SHIFT, False, chunk_len,
                                   low_coding=w0._low_coding,
                               allow_prev=True)
            )
        return acc

    def _steady(fn, *a, n=3):
        np.asarray(fn(*a))
        ts = []
        for _ in range(n):
            t0 = time.time()
            np.asarray(fn(*a))
            ts.append(time.time() - t0)
        return min(ts)

    # sustained device throughput: marginal cost of extra batches inside one
    # program (excludes the per-dispatch tunnel RPC, which production PCIe
    # hosts don't pay per batch)
    t1 = _steady(_enc_chain1, imgs_dev)
    t3 = _steady(_enc_chain3, imgs_dev)
    dev_enc_s = max((t3 - t1) / 2, 1e-9)
    dev_enc = BATCH * H * W / 1e6 / dev_enc_s

    # also report the single-dispatch number (includes one RPC round trip)
    def encode_device_batch():
        small, _states, ph, pl2, pp = fused_encode_batch(
            imgs_dev, w0._delta_high, w0._delta_low, SHIFT, False, chunk_len,
            low_coding=w0._low_coding, allow_prev=True,
        )
        small_np = np.asarray(small)
        total = 0
        for name in ("high", "low", "preview"):
            lo, hi = lay[f"counts_{name}"]
            total += int(small_np[lo:hi].sum()) * 2
        return total

    encode_device_batch()
    times = []
    for _ in range(3):
        t0 = time.time()
        encode_device_batch()
        times.append(time.time() - t0)
    dev_enc_1shot = BATCH * H * W / 1e6 / min(times)

    # ---- device-resident decode: compressed stream pre-staged in HBM-side
    # buffers, frames left in HBM.
    from fpv_tpu.api.fpvt_codec import (
        FpvtReader,
        batch_decode_args,
        fused_decode_batch,
    )

    rdr = FpvtReader(data)
    off0, b0 = rdr._batches[0]
    pb = rdr._parse_batch(off0)
    # canonical packaging shared with the reader/sharded paths (handles
    # CODING_CONST planes and the payload window slack)
    arrays, static = batch_decode_args(pb, chunk_len)
    dec_args = (
        jnp.asarray(arrays["payload"]), jnp.asarray(arrays["plane_offs"]),
        jnp.asarray(arrays["counts"]), jnp.asarray(arrays["states"]),
        jnp.asarray(arrays["flags"]), jnp.asarray(arrays["sym_tabs"]),
        jnp.asarray(arrays["fcs"]), rdr._delta_high, rdr._delta_low,
        jnp.asarray(arrays["const_vals"]),
    )
    jax.block_until_ready(dec_args)
    # full-fidelity decode: previews decode in the same fused program
    dec_kw = dict(chunk_len=chunk_len, b=b0, h=H, w=W,
                  decode_preview=True, **static)

    def decode_device_batch():
        imgs, ok, _pv = fused_decode_batch(*dec_args, **dec_kw)
        return bool(np.asarray(ok))

    assert decode_device_batch()
    times = []
    for _ in range(4):
        t0 = time.time()
        decode_device_batch()
        times.append(time.time() - t0)
    dev_dec = b0 * H * W / 1e6 / min(times)
    log(f"device-resident decode (frames+previews): {dev_dec:.1f} Mpix/s"
        f" ({min(times)*1000:.0f} ms / {b0} frames)")

    # ---- large-frame proof point: 4096x4096 (16 Mpix/frame — the format
    # allows 65536^2, fusion_power_video.cc:164).  Everything above is
    # <=1 Mpix/frame; this exercises the big-geometry tiling (payload
    # windows, rows_alloc) at speed.  Device-resident, same methodology as
    # the main sections.
    lf_enc = lf_dec = None
    try:
        from fpv_tpu.api.fpvt_codec import encode_file_fpvt

        LF_B, LF_H, LF_W = 4, 4096, 4096
        base_lf = testdata.plasma_frames(1, LF_H, LF_W, bits=BITS, seed=11)[0]
        lf_frames = np.stack(
            [np.roll(base_lf, (3 * i, 5 * i), (0, 1)) for i in range(LF_B + 1)]
        )
        lf_data = encode_file_fpvt(
            lf_frames, shift=SHIFT, frames_per_batch=LF_B
        )
        lf_ok = bool(
            (decode_file_fpvt(lf_data)
             == (lf_frames.astype(np.uint16) << SHIFT)).all()
        )
        lf_w = FpvtWriter(LF_W, LF_H, shift=SHIFT, frames_per_batch=LF_B)
        lf_w.init(lf_frames[0])
        lf_chunk = 1 << lf_w.header.chunk_log2
        lf_dev = jax.block_until_ready(jnp.asarray(lf_frames[1:]))

        @jax.jit
        def _lf_enc(im):
            return _reduce_all(
                fused_encode_batch(im, lf_w._delta_high, lf_w._delta_low,
                                   SHIFT, False, lf_chunk,
                                   low_coding=lf_w._low_coding,
                                   allow_prev=True)
            )

        lf_enc_s = _steady(_lf_enc, lf_dev)
        lf_enc = LF_B * LF_H * LF_W / 1e6 / lf_enc_s

        lf_rdr = FpvtReader(lf_data)
        lf_pb = lf_rdr._parse_batch(lf_rdr._batches[0][0])
        lf_arrays, lf_static = batch_decode_args(lf_pb, lf_chunk)
        lf_args = (
            jnp.asarray(lf_arrays["payload"]),
            jnp.asarray(lf_arrays["plane_offs"]),
            jnp.asarray(lf_arrays["counts"]),
            jnp.asarray(lf_arrays["states"]),
            jnp.asarray(lf_arrays["flags"]),
            jnp.asarray(lf_arrays["sym_tabs"]),
            jnp.asarray(lf_arrays["fcs"]),
            lf_rdr._delta_high, lf_rdr._delta_low,
            jnp.asarray(lf_arrays["const_vals"]),
        )
        jax.block_until_ready(lf_args)
        lf_kw = dict(chunk_len=lf_chunk, b=LF_B, h=LF_H, w=LF_W,
                     decode_preview=True, **lf_static)

        def _lf_dec():
            imgs, ok, _pv = fused_decode_batch(*lf_args, **lf_kw)
            return bool(np.asarray(ok))

        assert _lf_dec()
        lf_times = []
        for _ in range(4):
            t0 = time.time()
            _lf_dec()
            lf_times.append(time.time() - t0)
        lf_dec = LF_B * LF_H * LF_W / 1e6 / min(lf_times)
        log(f"large-frame 4096x4096: device encode {lf_enc:.1f} Mpix/s, "
            f"decode {lf_dec:.1f} Mpix/s ({min(lf_times)*1000:.0f} ms / "
            f"{LF_B} frames; lossless={lf_ok})")
        del lf_dev, lf_args, lf_frames
    except Exception as e:  # noqa: BLE001 — keep the main bench alive
        log(f"large-frame section failed: {e}")

    # ---- serving hub: MultiStreamDecoder throughput (bytes in -> frames
    # out through the fused per-batch decode program).  Includes the
    # host<->device transfers a serving process actually pays — on this
    # tunneled dev harness those dominate; on PCIe hosts this approaches
    # the device decode number.
    from fpv_tpu.api.multistream import MultiStreamDecoder

    def _hub_run(nstreams=2):
        # two concurrent camera streams: the hub's issue/finalize pipeline
        # overlaps stream A's frame download with stream B's payload upload
        # (duplex link) — the aggregate serving scenario
        pixels = [0]

        def _sink(sid, frames_out, ts):
            pixels[0] += frames_out.size

        hub = MultiStreamDecoder(sink=_sink)
        for i in range(nstreams):
            hub.add_stream(f"bench{i}")
        t0 = time.time()
        for i in range(nstreams):
            hub.feed(f"bench{i}", data)
        hub.close()
        return pixels[0], time.time() - t0

    _hub_run(1)  # compile warmup (decode_preview=False specialization)
    # same-session 1-stream vs 2-stream aggregate: with one attached chip
    # both streams share one device AND one tunnel, so the expected gain is
    # only the issue/finalize overlap; the ratio plus the link decomposition
    # below documents whether the hub or the link bounds aggregate serving
    hub1_px, hub1_dt = _hub_run(1)
    hub1_dec = hub1_px / 1e6 / hub1_dt
    hub_px, hub_dt = _hub_run()
    hub_dec = hub_px / 1e6 / hub_dt
    # link-bound ceiling for the hub workload: every stream's payload rides
    # up and its frame bytes ride down the SAME tunnel
    hub_link_ceiling = (
        hub_px / 1e6
        / (2 * len(data) / (link_up * 1e6) + 2 * npix * 2 / (link_down * 1e6))
    )
    log(f"multistream hub decode: 1 stream {hub1_dec:.1f} Mpix/s; "
        f"2 streams {hub_dec:.1f} Mpix/s aggregate "
        f"({hub_px/1e6:.0f} Mpix in {hub_dt:.1f}s; "
        f"shared-link ceiling {hub_link_ceiling:.1f} Mpix/s)")

    # ---- device-resident hub: payloads pre-staged in HBM (shared
    # content-addressed upload cache), frames LEFT in HBM (device_frames
    # sink) — the aggregate-serving number the tunnel otherwise hides.
    # 1/2/4 streams on one chip; remaining per-batch host work is section
    # parsing + content hashing + dispatch, which the issue/finalize
    # pipeline overlaps with device compute.
    hub_dev = {}
    try:
        stage: dict = {}

        def _hub_run_dev(nstreams):
            pixels = [0]

            def _sink(sid, frames_out, ts):
                # device arrays: count via shape, pull nothing
                pixels[0] += int(np.prod(frames_out.shape))

            hub = MultiStreamDecoder(
                sink=_sink, device_frames=True, upload_cache=stage
            )
            for i in range(nstreams):
                # multicast replay: every stream serves the SAME bytes and
                # the serving layer knows it — caller-declared identity
                # replaces per-section content hashing on the hot path
                hub.add_stream(f"dev{i}", content_id="bench-blob")
            t0 = time.time()
            for i in range(nstreams):
                hub.feed(f"dev{i}", data)
            hub.close()
            return pixels[0], time.time() - t0

        _hub_run_dev(1)  # compile (unpacked-output program) + stage uploads
        for ns in (1, 2, 4):
            ts_d = []
            px_d = 0
            for _ in range(3):
                px_d, dt_d = _hub_run_dev(ns)
                ts_d.append(dt_d)
            hub_dev[ns] = round(px_d / 1e6 / min(ts_d), 2)
        log(f"device-resident hub aggregate: 1 stream {hub_dev[1]:.1f}, "
            f"2 streams {hub_dev[2]:.1f}, 4 streams {hub_dev[4]:.1f} Mpix/s"
            f" (x{hub_dev[4]/max(hub_dev[1],1e-9):.2f} at 4; device decode "
            f"ceiling {dev_dec:.1f})")
    except Exception as e:  # noqa: BLE001 — keep the main bench alive
        log(f"device-resident hub section failed: {e}")

    # ---- low-plane ratio vs brotli-q1 (the reference's entropy coder):
    # the context-coded nibble mode should win on the residual low plane
    from fpv_tpu.entropy import brotli as _brotli
    from fpv_tpu.entropy.plane_codec import decode_plane_batch as _dpb

    low_plane = np.asarray(_dpb(pb.low))
    br_low = len(_brotli.compress(low_plane.tobytes()))
    low_coded = (
        pb.low.payload.size * 2 + pb.low.states.size * 4
        + pb.low.block_counts.size * 4 + 512
    )
    log(f"low plane coded: ctx-rANS {low_coded} B vs brotli-q1 {br_low} B "
        f"({low_coded/br_low:.3f}x)")
    log(f"device-resident encode sustained: {dev_enc:.1f} Mpix/s"
        f" (marginal {dev_enc_s*1000:.0f} ms / {BATCH} frames); "
        f"single-dispatch {dev_enc_1shot:.1f} Mpix/s")

    # ---- e2e decomposition: model each e2e time as link transfers (at the
    # measured tunnel rate) + codec device time, and project what the same
    # codec does on a production host link (PCIe v4 x16 ~16 GB/s; override
    # with FPV_TPU_NOMINAL_LINK_MBS).  model ~= measured attributes the e2e
    # gap to the link with evidence; projected is the shippable claim.
    nominal = float(os.environ.get("FPV_TPU_NOMINAL_LINK_MBS", "16000"))
    t_codec_enc = npix / 1e6 / dev_enc_1shot
    t_codec_dec = npix / 1e6 / dev_dec

    def _e2e_model(fr_up: float, pay_down: float,
                   pay_up: float, img_down: float):
        # each transfer leg at the measured rate of ITS OWN shape:
        # encode = frames up (u16 3-D) + codec + payload down (1-D),
        # decode = payload up (1-D) + codec + packed frames down (u8 4-D)
        t_enc = (frames.nbytes / (fr_up * 1e6) + t_codec_enc
                 + len(data) / (pay_down * 1e6))
        t_dec = (len(data) / (pay_up * 1e6) + t_codec_dec
                 + npix * 2 / (img_down * 1e6))
        return npix / 1e6 / t_enc, npix / 1e6 / t_dec

    e2e_enc_model, e2e_dec_model = _e2e_model(
        up_frames, down_1d, up_1d, down_imgs
    )
    e2e_enc_proj, e2e_dec_proj = _e2e_model(*((nominal,) * 4))
    log(f"e2e encode: {e2e_enc:.1f} Mpix/s (link+codec model "
        f"{e2e_enc_model:.1f}), e2e decode: {e2e_dec:.1f} Mpix/s (model "
        f"{e2e_dec_model:.1f}) — tunnel link-bound; projected at "
        f"{nominal:.0f} MB/s link: encode {e2e_enc_proj:.1f}, "
        f"decode {e2e_dec_proj:.1f} Mpix/s")
    log(f"vs reference encode: device single-dispatch "
        f"{dev_enc_1shot/ref_mps:.2f}x, e2e {e2e_enc/ref_mps:.2f}x")

    # ---- decode bound fraction: is the rANS decode kernel at its serial
    # dependency-chain bound?  T_chain/T_full from interleaved replica
    # timing (docs/DECODE_BOUND.md); keeps the plateau claim measured,
    # not asserted.
    bound = {}
    try:
        from fpv_tpu.ops.rans_bound import bound_report

        bound = bound_report(nblocks=32, reps=3)
        log(f"decode bound: full {bound['full_msym_s']:.0f} Msym/s, "
            f"chain ceiling {bound['chain_ceiling_msym_s']:.0f}, "
            f"fraction {bound['decode_bound_fraction']:.3f} "
            f"(core {bound['core_fraction']:.3f})")
    except Exception as e:  # noqa: BLE001 — bench must not die on a probe
        log(f"decode bound probe failed: {e}")

    # ---- cold-start with a warm persistent compilation cache: a FRESH
    # process warms this exact stream geometry; the persistent cache
    # (fpv_tpu.__init__._enable_jit_cache) should make it compile-free.
    warm_cache_s = None
    try:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c",
             "from fpv_tpu.api.fpvt_codec import warmup_stream; "
             f"warmup_stream({W}, {H}, shift={SHIFT}, "
             f"frames_per_batch={BATCH})"],
            capture_output=True, timeout=600, cwd=REPO,
        )
        if p.returncode == 0:
            warm_cache_s = time.time() - t0
            log(f"fresh-process warmup with warm cache: {warm_cache_s:.1f}s"
                " (process start -> stream geometry ready)")
        else:
            log(f"warm-cache warmup probe failed rc={p.returncode}: "
                f"{p.stderr.decode()[-200:]}")
    except subprocess.TimeoutExpired:
        log("warm-cache warmup probe timed out (600s)")

    # ---- compression-ratio parity across corpus types (size vs the live
    # reference binary; one shape so all corpora share compiled programs)
    corpus_ratios = {}
    corpus_codings = {}
    raw_dec_mps = None
    ref_enc_bin = _build_ref_tool("encode.cc", REFBIN.parent / "ref_encode")
    if ref_enc_bin is not None:
        sweep = [
            ("plasma12s", testdata.plasma_frames(16, 512, 512, bits=12,
                                                 seed=5), 4),
            ("noise16", testdata.noise_frames(16, 512, 512, bits=16), 0),
            ("ramp12s", np.tile(
                (np.arange(512 * 512) % 4096).astype(np.uint16)
                .reshape(1, 512, 512), (16, 1, 1)), 4),
        ]
        # realistic sensor content (same 16x512x512 shape so all corpora
        # share compiled programs): smooth+shot-noise, dark scene with hot
        # pixels, slow spatial drift (temporal structure)
        _prng = np.random.default_rng(0)
        _pl = testdata.plasma_frames(16, 512, 512, bits=12, seed=5).astype(
            np.int32
        )
        sweep.append(("mixed12", np.clip(
            _pl + _prng.normal(0, 8, _pl.shape), 0, 4095
        ).astype(np.uint16), 4))
        _dark = _prng.poisson(50, (16, 512, 512)).astype(np.uint16)
        _dark[_prng.random((16, 512, 512)) < 1e-4] = 4000
        sweep.append(("dark12", _dark, 4))
        sweep.append(("drift12", np.stack(
            [np.roll(_pl[0], (i, i), (0, 1)) for i in range(16)]
        ).astype(np.uint16), 4))
        # smooth high byte + iid low byte: the low plane's residuals are
        # incompressible, so its stream goes CODING_RAW (stored verbatim,
        # format v6) — the corpus that exercises the raw path for real
        _hi_base = testdata.plasma_frames(1, 512, 512, bits=8, seed=3)[0]
        _rl = np.empty((16, 512, 512), np.uint16)
        for _t in range(16):
            _rl[_t] = (
                (((_hi_base.astype(np.uint16) + _t) & 0xFF) << 8)
                | _prng.integers(0, 256, (512, 512)).astype(np.uint16)
            )
        sweep.append(("rawlow16", _rl, 0))
        from fpv_tpu.api.fpvt_codec import encode_file_fpvt

        _coding_names = {0: "order0", 1: "ctx16", 2: "const", 3: "raw"}
        for cname, cframes, cshift in sweep:
            rr = subprocess.run(
                [str(ref_enc_bin), "512", "512", "0", str(cshift), "4"],
                input=testdata.to_raw_bytes(cframes), capture_output=True,
            )
            if rr.returncode != 0 or not rr.stdout:
                log(f"corpus {cname}: reference encoder failed "
                    f"(rc={rr.returncode}); skipping ratio")
                continue
            ours_c = encode_file_fpvt(
                cframes, shift=cshift, frames_per_batch=16
            )
            ok_c = bool(
                (decode_file_fpvt(ours_c)
                 == (cframes.astype(np.uint16) << cshift)).all()
            )
            ratio = len(ours_c) / len(rr.stdout)
            corpus_ratios[cname] = round(ratio, 4)
            # per-plane coding choices (order0/ctx16/const/raw per batch):
            # proves which entropy mode each corpus actually exercises
            rdr_c = FpvtReader(ours_c)
            pb_c = rdr_c._parse_batch(rdr_c._batches[0][0])
            modes_c = {
                pname: (_coding_names[st.coding] if st is not None else None)
                for pname, st in zip(
                    ("high", "low", "preview"),
                    (pb_c.high, pb_c.low, pb_c.preview),
                )
            }
            corpus_codings[cname] = modes_c
            log(f"corpus {cname}: fpvt {8*len(ours_c)/cframes.size:.4f} bpp"
                f" vs ref {8*len(rr.stdout)/cframes.size:.4f} bpp"
                f" ({ratio:.4f}x, lossless={ok_c}, codings={modes_c})")
            if cname == "rawlow16" and modes_c["low"] == "raw":
                # device decode throughput with a raw plane in the batch:
                # the claimed memcpy-bound raw decode, measured.  The
                # corpus files auto-pick large chunks (narrow streams, the
                # slow path), so re-encode at the main stream's fused
                # geometry (chunk 4096 -> 1024-lane wide streams).
                try:
                    from fpv_tpu.api.fpvt_codec import _fused_decodable

                    # the 16-frame ratio corpus sits exactly AT the narrow
                    # policy boundary (16*512^2 == NARROW_MAX_SYMS), so its
                    # streams host-code narrow; time the raw path on a
                    # 32-frame batch (8.4M syms > boundary -> wide fused
                    # geometry), fresh noise per frame so low stays raw
                    _rl32 = np.empty((32, 512, 512), np.uint16)
                    for _t in range(32):
                        _rl32[_t] = (
                            (((_hi_base.astype(np.uint16) + _t) & 0xFF) << 8)
                            | _prng.integers(0, 256, (512, 512)).astype(
                                np.uint16
                            )
                        )
                    # zero delta keeps every frame's residual iid noise
                    # (delta=_rl32[0] would zero frame 0's residual and tip
                    # the batch entropy below the raw threshold)
                    ours_t = encode_file_fpvt(
                        _rl32, shift=cshift, frames_per_batch=32,
                        chunk_log2=12, delta_frame=np.zeros_like(_rl32[0]),
                    )
                    rdr_c = FpvtReader(ours_t)
                    pb_c = rdr_c._parse_batch(rdr_c._batches[0][0])
                    ck = 1 << rdr_c.header.chunk_log2
                    if not _fused_decodable(pb_c, ck):
                        raise RuntimeError(
                            "raw corpus stream not fused-decodable"
                        )
                    from fpv_tpu.ops.rans_layout import CODING_RAW as _CRAW

                    if pb_c.low is None or pb_c.low.coding != _CRAW:
                        raise RuntimeError("timing batch's low plane not raw")
                    arr_r, st_r = batch_decode_args(pb_c, ck)
                    args_r = (
                        jnp.asarray(arr_r["payload"]),
                        jnp.asarray(arr_r["plane_offs"]),
                        jnp.asarray(arr_r["counts"]),
                        jnp.asarray(arr_r["states"]),
                        jnp.asarray(arr_r["flags"]),
                        jnp.asarray(arr_r["sym_tabs"]),
                        jnp.asarray(arr_r["fcs"]),
                        rdr_c._delta_high, rdr_c._delta_low,
                        jnp.asarray(arr_r["const_vals"]),
                    )
                    jax.block_until_ready(args_r)
                    b_r = len(pb_c.frame_flags)
                    kw_r = dict(chunk_len=ck, b=b_r, h=512, w=512,
                                decode_preview=True, **st_r)

                    def _dec_r():
                        _imgs, okr, _pv = fused_decode_batch(*args_r, **kw_r)
                        return bool(np.asarray(okr))

                    assert _dec_r()
                    ts_r = []
                    for _ in range(4):
                        t0 = time.time()
                        _dec_r()
                        ts_r.append(time.time() - t0)
                    raw_dec_mps = b_r * 512 * 512 / 1e6 / min(ts_r)
                    log(f"raw-plane device decode (low=raw): "
                        f"{raw_dec_mps:.1f} Mpix/s")
                except Exception as e:  # noqa: BLE001
                    log(f"raw decode timing failed: {e}")

    # headline = the honest single-dispatch device number (one fused
    # program, one host round trip); the marginal-cost "sustained" figure
    # is reported as a secondary field
    print(json.dumps({
        "metric": "fpvt_device_encode_throughput",
        "value": round(dev_enc_1shot, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(dev_enc_1shot / ref_mps, 3),
        "device_encode_sustained_mpix_s": round(dev_enc, 2),
        "e2e_encode_mpix_s": round(e2e_enc, 2),
        "e2e_decode_mpix_s": round(e2e_dec, 2),
        "link_up_mb_s": round(link_up, 1),
        "link_down_mb_s": round(link_down, 1),
        "link_frames_up_mb_s": round(up_frames, 1),
        "link_payload_up_mb_s": round(up_1d, 1),
        "link_payload_down_mb_s": round(down_1d, 1),
        "link_imgs_down_mb_s": round(down_imgs, 1),
        "e2e_encode_phases_s": e2e_enc_phases,
        "e2e_encode_model_mpix_s": round(e2e_enc_model, 2),
        "e2e_decode_model_mpix_s": round(e2e_dec_model, 2),
        "e2e_encode_projected_mpix_s": round(e2e_enc_proj, 2),
        "e2e_decode_projected_mpix_s": round(e2e_dec_proj, 2),
        "device_decode_mpix_s": round(dev_dec, 2),
        "multistream_decode_mpix_s": round(hub_dec, 2),
        "multistream_decode_1stream_mpix_s": round(hub1_dec, 2),
        "multistream_aggregate_ratio": round(hub_dec / max(hub1_dec, 1e-9), 3),
        "multistream_link_ceiling_mpix_s": round(hub_link_ceiling, 2),
        "hub_device_resident_mpix_s": (
            {str(k): v for k, v in hub_dev.items()} or None
        ),
        "hub_device_resident_scaling_4v1": (
            round(hub_dev[4] / hub_dev[1], 3)
            if 4 in hub_dev and hub_dev.get(1) else None
        ),
        "warm_cache_warmup_s": (
            round(warm_cache_s, 1) if warm_cache_s is not None else None
        ),
        "decode_bound_fraction": (
            round(bound["decode_bound_fraction"], 3) if bound else None
        ),
        "decode_chain_ceiling_msym_s": (
            round(bound["chain_ceiling_msym_s"], 1) if bound else None
        ),
        "rans_decode_msym_s": (
            round(bound["full_msym_s"], 1) if bound else None
        ),
        "large_frame_device_encode_mpix_s": (
            round(lf_enc, 2) if lf_enc is not None else None
        ),
        "large_frame_device_decode_mpix_s": (
            round(lf_dec, 2) if lf_dec is not None else None
        ),
        "bits_per_pixel": round(8 * len(data) / npix, 3),
        "lossless_roundtrip": True,
        "fpv1_encode_mpix_s": round(fpv1_mps, 2),
        "fpv1_decode_mpix_s": round(fpv1_dec_mps, 2),
        "fpv1_vs_baseline": round(fpv1_mps / ref_mps, 3),
        "fpv1_lossless_roundtrip": fpv1_ok,
        "low_plane_vs_brotli": round(low_coded / br_low, 4),
        "corpus_size_ratios_vs_ref": corpus_ratios,
        "corpus_coding_modes": corpus_codings,
        "raw_corpus_device_decode_mpix_s": (
            round(raw_dec_mps, 2) if raw_dec_mps is not None else None
        ),
        "baseline_mpix_s": round(ref_mps, 2),
    }))


if __name__ == "__main__":
    main()
