"""CLI tools: argv contract + stdin/stdout pipes + reference interop."""

import subprocess
import sys

import numpy as np
import pytest

from fpv_tpu.utils import testdata

from conftest import REPO, ref_encode, requires_reference

ENV_CPU = {"JAX_PLATFORMS": "cpu"}


def run_cli(module, args, stdin: bytes) -> bytes:
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", module, *args],
        input=stdin, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        check=True, cwd=REPO, env=env,
    )
    return proc.stdout


@requires_reference
def test_cli_encode_matches_reference():
    frames = testdata.plasma_frames(3, 32, 40, bits=12)
    raw = testdata.to_raw_bytes(frames)
    ours = run_cli("fpv_tpu.cli.encode", ["40", "32", "0", "4", "2"], raw)
    theirs = ref_encode(raw, 40, 32, 0, 4)
    assert ours == theirs


@requires_reference
def test_cli_decode_reference_stream():
    frames = testdata.plasma_frames(3, 32, 40, bits=12)
    raw = testdata.to_raw_bytes(frames)
    compressed = ref_encode(raw, 40, 32, 0, 4)
    out = run_cli("fpv_tpu.cli.decode", ["40", "32", "0", "4"], compressed)
    assert out == raw


def test_cli_fpvt_pipe_roundtrip():
    frames = testdata.plasma_frames(4, 32, 32)
    raw = testdata.to_raw_bytes(frames)
    compressed = run_cli(
        "fpv_tpu.cli.encode", ["32", "32", "0", "0", "--profile", "fpvt"], raw
    )
    assert compressed[:4] == b"FPVT"
    out = run_cli("fpv_tpu.cli.decode", ["32", "32", "0", "0"], compressed)
    assert out == raw


def test_cli_usage_errors():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, "-m", "fpv_tpu.cli.encode"],
        input=b"", capture_output=True, cwd=REPO, env=env,
    )
    assert p.returncode == 1 and b"Usage" in p.stderr
    p = subprocess.run(
        [sys.executable, "-m", "fpv_tpu.cli.encode", "0", "5", "0", "0"],
        input=b"", capture_output=True, cwd=REPO, env=env,
    )
    assert p.returncode == 1 and b"invalid" in p.stderr
