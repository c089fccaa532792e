"""Batched on-device decision heuristics.

The reference's prediction decisions (fusion_power_video.cc:517-564) need two
ingredients per frame: sampled 256-bin histograms and the integer entropy
estimate.  On device we compute the histograms batched; the (tiny) entropy
comparison runs on host with exact Python integers
(:mod:`fpv_tpu.models.heuristics`) to preserve the reference's int32/uint64
quirks without dragging 64-bit arithmetic into the kernels.

The delta decision needs no histogram at all: the reference's "delta"
histogram is degenerate (every sample lands in bin 0, entropy exactly 0 —
see fpv_tpu.models.heuristics), so USE_DELTA is taken iff the sampled
original histogram has entropy > 0, which holds iff the stride-15 samples of
the high plane are not all equal.  That reduces to one vectorized comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def delta_decision(high: jax.Array) -> jax.Array:
    """bool[B]: whether the reference would enable delta prediction.

    True iff the stride-15 samples (fusion_power_video.cc:522-531) of the
    high plane are not all identical (see module docstring for the proof
    sketch).
    """
    b = high.shape[0]
    flat = high.reshape(b, -1)
    samples = flat[:, ::15]
    return jnp.any(samples != samples[:, :1], axis=1)


@jax.jit
def cg_histograms(high: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sampled histograms for the CG decision (fusion_power_video.cc:546-564).

    Samples flat indices ``xsize+1, xsize+1+31, ...`` of the (possibly
    delta-predicted) high plane; returns (counta, countb) as int32 [B, 256]:
    counta over original samples, countb over CG residual samples computed
    with flat-buffer neighbor semantics.
    """
    from fpv_tpu.ops.predict import clamped_gradient

    b, h, w = high.shape
    size = h * w
    flat = high.reshape(b, size)
    idx = jnp.arange(w + 1, size, 31)
    a = flat[:, idx]
    n = flat[:, idx - w]
    ww = flat[:, idx - 1]
    nw = flat[:, idx - w - 1]
    res = a - clamped_gradient(n, ww, nw)

    def hist(x: jax.Array) -> jax.Array:
        # one segment-sum over B*256 bins
        ids = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * 256 + x.astype(jnp.int32)
        ).reshape(-1)
        ones = jnp.ones(ids.shape, dtype=jnp.int32)
        return jax.ops.segment_sum(ones, ids, num_segments=b * 256).reshape(b, 256)

    return hist(a), hist(res)


@jax.jit
def histogram256(plane: jax.Array) -> jax.Array:
    """Full (unsampled) per-frame byte histogram, int32 [B, 256].

    Used by the FPVT profile to build rANS frequency tables on device.
    """
    b = plane.shape[0]
    flat = plane.reshape(b, -1)
    ids = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * 256 + flat.astype(jnp.int32)
    ).reshape(-1)
    ones = jnp.ones(ids.shape, dtype=jnp.int32)
    return jax.ops.segment_sum(ones, ids, num_segments=b * 256).reshape(b, 256)
