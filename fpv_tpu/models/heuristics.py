"""Bit-exact predictor-decision heuristics.

The reference encoder decides per frame whether to apply delta prediction and
clamped-gradient prediction using sampled 256-bin histograms and an integer
entropy estimate (reference: fusion_power_video.cc:216-244, 517-564).  For
byte-exact encode parity our decisions must match the reference *including its
integer-width quirks*:

* ``approxLog2(v)`` is ``floor(log2(v))`` computed via count-leading-zeros
  (fusion_power_video.cc:216-232).  ``approxLog2(0)`` is never observable:
  zero-count bins contribute ``0 * (...) == 0`` to the accumulator.
* ``EstimateEntropy`` (fusion_power_video.cc:235-244) accumulates with
  ``std::accumulate(..., 0, ...)`` whose accumulator is a C ``int`` (int32).
  Each step computes ``acc - v * (approxLog2(v) - log2sum)`` in uint64 and
  narrows back to int32.  Because truncation mod 2^32 commutes with addition,
  this equals ``int32(sum_v v * (log2sum - approxLog2(v)) mod 2^32)``.
  The final value is sign-extended to uint64 ("size_t sumOfLogs") and the
  result is ``(1024 * sumOfLogs) mod 2^64 // sum`` in uint64 arithmetic.
* The delta-prediction heuristic (fusion_power_video.cc:522-533) computes
  ``d = a - high[i]`` where ``a = high[i]`` — i.e. always 0 — so its "delta"
  histogram puts every sample in bin 0 and estimates entropy 0.  Delta
  prediction is therefore applied whenever ``0 < EstimateEntropy(counta)``,
  i.e. unless the sampled original histogram itself has entropy 0.  We
  replicate this decision behavior exactly for encode parity.

All functions here are plain-Python/numpy; the batched on-device versions in
:mod:`fpv_tpu.ops.heuristics` are tested against these.
"""

from __future__ import annotations

import numpy as np

_MASK32 = (1 << 32) - 1
_MASK64 = (1 << 64) - 1


def approx_log2(v: int) -> int:
    """floor(log2(v)) for v >= 1 (reference fusion_power_video.cc:216-232)."""
    if v <= 0:
        raise ValueError("approx_log2 requires v >= 1")
    return v.bit_length() - 1


def estimate_entropy(counts) -> int:
    """Integer entropy estimate of a 256-bin histogram.

    Bit-exact port of ``EstimateEntropy`` (fusion_power_video.cc:235-244)
    including the int32 accumulator narrowing and uint64 final arithmetic.
    Returns the uint64 value the reference would compute.
    """
    counts = [int(c) for c in counts]
    # std::accumulate(..., 0): int accumulator; counts are small enough in all
    # reference uses that this sum never overflows int32, but we wrap anyway.
    sum_ = 0
    for c in counts:
        sum_ = (sum_ + c) & _MASK32
        if sum_ >= 1 << 31:
            sum_ -= 1 << 32
    if sum_ == 0:
        return 0
    sum_u64 = sum_ & _MASK64  # size_t conversion (sign extension)

    log2sum = approx_log2(sum_ if sum_ > 0 else sum_u64)
    # acc(int32) = sum over bins of v * (log2sum - approxLog2(v)), mod 2^32.
    total = 0
    for v in counts:
        if v == 0:
            continue
        total += v * (log2sum - approx_log2(v))
    acc32 = total & _MASK32
    if acc32 >= 1 << 31:
        acc32 -= 1 << 32  # int32 narrowing
    sum_of_logs = acc32 & _MASK64  # size_t sumOfLogs = (sign-extended) acc
    return ((1024 * sum_of_logs) & _MASK64) // sum_u64


def sampled_histogram(plane: np.ndarray, start: int, skip: int) -> np.ndarray:
    """256-bin histogram of plane.flat[start::skip] (uint8 values)."""
    flat = plane.reshape(-1)
    return np.bincount(flat[start::skip], minlength=256).astype(np.uint64)


def decide_delta(high: np.ndarray) -> bool:
    """Reference delta-prediction decision (fusion_power_video.cc:522-533).

    Samples every 15th pixel of the (pre-prediction) high plane.  The sampled
    "delta" histogram is degenerate (all zeros bin, see module docstring), so
    the decision reduces to ``0 < EstimateEntropy(counta)``.
    """
    counta = sampled_histogram(high, 0, 15)
    num_samples = int(counta.sum())
    countd = np.zeros(256, dtype=np.uint64)
    countd[0] = num_samples
    return estimate_entropy(countd) < estimate_entropy(counta)


def decide_cg(high: np.ndarray) -> bool:
    """Reference clamped-gradient decision (fusion_power_video.cc:546-564).

    Samples pixels ``i = xsize+1, xsize+1+31, ...`` of the high plane and
    compares entropy of the CG residual vs the original values.
    """
    from fpv_tpu.models.predictors import clamped_gradient_np

    ysize, xsize = high.shape
    size = xsize * ysize
    flat = high.reshape(-1)
    idx = np.arange(xsize + 1, size, 31)
    a = flat[idx]
    n = flat[idx - xsize]
    w = flat[idx - 1]
    nw = flat[idx - xsize - 1]
    b = (a - clamped_gradient_np(n, w, nw)).astype(np.uint8)
    counta = np.bincount(a, minlength=256).astype(np.uint64)
    countb = np.bincount(b, minlength=256).astype(np.uint64)
    return estimate_entropy(countb) < estimate_entropy(counta)
