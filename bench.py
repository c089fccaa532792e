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
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
REFBIN = REPO / ".refbin" / "ref_benchmark"
RECORDED_BASELINE_MPS = 43.98  # ref_benchmark, this box, 32x1024x1024 12-bit

# benchmark configuration (mirrors the BASELINE.json corpus shape)
FRAMES, H, W, BITS, SHIFT = 16, 1024, 1024, 12, 4
BATCH = 8


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_reference() -> pathlib.Path | None:
    if REFBIN.exists():
        return REFBIN
    src = pathlib.Path("/root/reference")
    if not src.exists():
        return None
    REFBIN.parent.mkdir(exist_ok=True)
    cmd = (
        f"g++ -O3 -std=c++14 -I{REPO}/native/brotli_shim "
        f"{src}/fusion_power_video.cc {src}/benchmark.cc "
        "-l:libbrotlienc.so.1 -l:libbrotlidec.so.1 -l:libbrotlicommon.so.1 "
        f"-lpthread -o {REFBIN}"
    )
    try:
        subprocess.run(cmd, shell=True, check=True, capture_output=True)
        return REFBIN
    except subprocess.CalledProcessError:
        return None


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


def main() -> None:
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

    def encode_once() -> bytes:
        w = FpvtWriter(W, H, shift=SHIFT, frames_per_batch=BATCH)
        parts = [w.init(frames[0])]
        for s in range(0, FRAMES, BATCH):
            parts.append(w.encode_batch(frames[s : s + BATCH]))
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

    # steady-state measurements
    times = []
    for _ in range(3):
        t0 = time.time()
        encode_once()
        times.append(time.time() - t0)
    enc_s = min(times)
    enc_mps = npix / 1e6 / enc_s

    times = []
    for _ in range(3):
        t0 = time.time()
        decode_file_fpvt(data)
        times.append(time.time() - t0)
    dec_s = min(times)
    dec_mps = npix / 1e6 / dec_s

    log(f"encode: {enc_s*1000:.0f} ms = {enc_mps:.1f} Mpix/s "
        f"({mb/enc_s:.0f} MB/s)")
    log(f"decode: {dec_s*1000:.0f} ms = {dec_mps:.1f} Mpix/s")
    log(f"vs reference encode: {enc_mps/ref_mps:.2f}x")

    print(json.dumps({
        "metric": "fpvt_encode_throughput",
        "value": round(enc_mps, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(enc_mps / ref_mps, 3),
        "decode_mpix_s": round(dec_mps, 2),
        "bits_per_pixel": round(8 * len(data) / npix, 3),
        "lossless_roundtrip": True,
    }))


if __name__ == "__main__":
    main()
