"""Regenerate the golden wire-format fixtures under tests/golden/.

Fixtures pin the wire formats the way the reference pins its own
(/root/reference/fusion_power_video.cc:30-155 is a normative spec comment):
any silent change to writer output or to an old version's readability
fails tests/test_golden.py loudly.

Inputs are generated here with a seeded ``np.random.default_rng`` (stable
across numpy versions by spec) and stored in ``inputs.npz`` so fixtures
never depend on fpv_tpu.utils.testdata staying frozen.

The v4 and v5 fixtures were produced by the GENUINE historical writers,
extracted from git history — not by relabeling current bytes:

    git archive 1d37527^ fpv_tpu | tar -x -C /tmp/v4src   # VERSION = 4
    git archive 37b54eb^ fpv_tpu | tar -x -C /tmp/v5src   # VERSION = 5
    PYTHONPATH=/tmp/v4src JAX_PLATFORMS=cpu python make_fixtures.py --old v4
    PYTHONPATH=/tmp/v5src JAX_PLATFORMS=cpu python make_fixtures.py --old v5

Current-version fixtures + the writer-hash pins:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python make_fixtures.py

Do NOT regenerate v4/v5 casually: they are historical artifacts; if they
stop decoding, that is a compatibility break to fix in the reader, not in
the fixture.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

ENC = dict(shift=4, frames_per_batch=4, chunk_log2=8)
ENC_NOISE = dict(shift=0, frames_per_batch=4, chunk_log2=8)


def make_inputs() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260820)
    h, w = 32, 48
    # drift: smooth 12-bit blob translating 1 px/frame — exercises delta,
    # CG/up spatial prediction, and (v5+) F_USE_PREV chains
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        1800 * np.exp(-(((yy - 14) / 7) ** 2 + ((xx - 20) / 9) ** 2))
        + 900 * np.exp(-(((yy - 22) / 5) ** 2 + ((xx - 33) / 6) ** 2))
        + 300
    )
    noise = rng.normal(0, 3, (8, h, w))
    drift = np.stack(
        [np.roll(base, (i, i), (0, 1)) for i in range(8)]
    )
    drift = np.clip(drift + noise, 0, 4095).astype(np.uint16)
    # noise16: iid full-range — low plane goes CODING_RAW under the v6
    # policy, high plane stays coded
    noise16 = rng.integers(0, 65536, (4, h, w), dtype=np.uint16)
    return {"drift": drift, "noise16": noise16}


def load_inputs() -> dict[str, np.ndarray]:
    path = os.path.join(HERE, "inputs.npz")
    if not os.path.exists(path):
        arrs = make_inputs()
        np.savez_compressed(path, **arrs)
        print(f"wrote {path}")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def sha256(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def main() -> None:
    inputs = load_inputs()
    drift, noise16 = inputs["drift"], inputs["noise16"]

    if "--old" in sys.argv:
        # Run under PYTHONPATH of a historical checkout: emit only that
        # version's fixture.
        tag = sys.argv[sys.argv.index("--old") + 1]
        from fpv_tpu.api.fpvt_codec import encode_file_fpvt
        from fpv_tpu.format import fpvt

        assert tag == f"v{fpvt.VERSION}", (tag, fpvt.VERSION)
        data = encode_file_fpvt(drift, **ENC)
        out = os.path.join(HERE, f"{tag}.fpvt")
        with open(out, "wb") as f:
            f.write(data)
        print(f"wrote {out} ({len(data)} bytes, version {data[4]})")
        return

    from fpv_tpu.api.encoder import encode_file
    from fpv_tpu.api.fpvt_codec import encode_file_fpvt
    from fpv_tpu.format import fpvt

    hashes: dict[str, str] = {}

    v6_drift = encode_file_fpvt(drift, **ENC)
    v6_raw = encode_file_fpvt(noise16, **ENC_NOISE)
    fpv1 = encode_file(drift, shift=4, num_threads=0)
    for name, blob in (
        (f"v{fpvt.VERSION}_drift.fpvt", v6_drift),
        (f"v{fpvt.VERSION}_raw.fpvt", v6_raw),
        ("v1_drift.fpv", fpv1),
    ):
        with open(os.path.join(HERE, name), "wb") as f:
            f.write(blob)
        hashes[name] = sha256(blob)
        print(f"wrote {name} ({len(blob)} bytes)")

    with open(os.path.join(HERE, "hashes.json"), "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    print("wrote hashes.json")


if __name__ == "__main__":
    main()
