"""Batched prediction ops on device.

Encode-side transforms are embarrassingly parallel (they read original
neighbor values, like the reference's reverse-order loop into a fresh buffer,
fusion_power_video.cc:564-572) and compile to fused elementwise programs.

Decode-side:

* delta: elementwise add.
* reference ("flat") CG: the reference treats the plane as a FLAT buffer, so
  a column-0 pixel's west neighbor is the previous row's last pixel
  (``high[i-1]`` at ``i = y*W``, fusion_power_video.cc:326-333).  That wrap
  gives the reconstruction an O(H*W) critical path — inherently sequential —
  so compat decode runs on host (numpy/native); see
  :func:`fpv_tpu.models.predictors.cg_decode_np`.
* FPVT 2D CG: the TPU-native profile defines CG without the wrap (row 0
  verbatim, column 0 north-predicted), decodable by an anti-diagonal
  wavefront with O(H+W) depth — :func:`cg2d_decode`.
* FPVT "up" predictor: pure north prediction; decode is a mod-256 cumulative
  sum down columns, O(log H) depth.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def clamped_gradient(n: jax.Array, w: jax.Array, nw: jax.Array) -> jax.Array:
    """Branchless ClampedGradient on uint8 (fusion_power_video.cc:247-252)."""
    i = jnp.minimum(n, w)
    a = jnp.maximum(n, w)
    g = n + w - nw  # uint8 wraparound
    clamped = jnp.where(nw < i, a, g)
    return jnp.where(nw > a, i, clamped)


@jax.jit
def delta_encode(plane: jax.Array, delta_plane: jax.Array) -> jax.Array:
    return plane - delta_plane  # uint8 wrap


@jax.jit
def delta_decode(plane: jax.Array, delta_plane: jax.Array) -> jax.Array:
    return plane + delta_plane  # uint8 wrap


@jax.jit
def cg_flat_encode(plane: jax.Array) -> jax.Array:
    """Reference-semantics CG residual of [B, H, W] uint8 planes.

    Flat-buffer neighbors: n = flat[i-W], w = flat[i-1], nw = flat[i-W-1];
    pixels i <= W (row 0 plus (1,0)) are stored verbatim
    (fusion_power_video.cc:564-572).
    """
    b, h, w = plane.shape
    flat = plane.reshape(b, h * w)
    n = jnp.roll(flat, w, axis=1)
    ww = jnp.roll(flat, 1, axis=1)
    nw = jnp.roll(flat, w + 1, axis=1)
    res = flat - clamped_gradient(n, ww, nw)
    idx = jnp.arange(h * w)
    out = jnp.where(idx >= w + 1, res, flat)
    return out.reshape(b, h, w)


@jax.jit
def cg2d_encode(plane: jax.Array) -> jax.Array:
    """FPVT 2D CG residual: row 0 verbatim, column 0 north-predicted,
    interior clamped-gradient.  Fully parallel."""
    n = jnp.roll(plane, 1, axis=1)
    w = jnp.roll(plane, 1, axis=2)
    nw = jnp.roll(n, 1, axis=2)
    pred = clamped_gradient(n, w, nw)
    res = plane - pred
    res_col0 = plane - n  # north-only on column 0
    b, h, wd = plane.shape
    cols = jnp.arange(wd)[None, None, :]
    rows = jnp.arange(h)[None, :, None]
    out = jnp.where(cols == 0, res_col0, res)
    return jnp.where(rows == 0, plane, out)


def _cg2d_decode_impl(res: jax.Array) -> jax.Array:
    """Anti-diagonal wavefront reconstruction of :func:`cg2d_encode`.

    Skew trick: shift row y right by y so anti-diagonals become columns, then
    ``lax.scan`` over columns carrying the previous two skewed columns.  Depth
    H+W-1; each step is a [B, H] vector op.
    """
    b, h, w = res.shape
    # skewed buffer: [B, H, W + H] with row y occupying columns y .. y+W-1
    skew = jnp.zeros((b, h, w + h), dtype=res.dtype)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    skew = skew.at[:, rows, cols + rows].set(res)

    row_idx = jnp.arange(h)

    def step(carry, d):
        prev1, prev2 = carry  # skewed columns d-1 and d-2, each [B, H]
        cur = jax.lax.dynamic_slice_in_dim(skew, d, 1, axis=2)[:, :, 0]
        # for skewed column d, row y holds original (y, d-y); neighbors:
        # n  = (y-1, d-y)   -> skewed col d-1, row y-1
        # w  = (y,   d-y-1) -> skewed col d-1, row y
        # nw = (y-1, d-y-1) -> skewed col d-2, row y-1
        n = jnp.roll(prev1, 1, axis=1)
        ww = prev1
        nw = jnp.roll(prev2, 1, axis=1)
        x = d - row_idx  # original column per row
        pred = jnp.where(
            (row_idx == 0)[None, :],
            jnp.zeros_like(cur),
            jnp.where((x == 0)[None, :], n, clamped_gradient(n, ww, nw)),
        )
        valid = ((x >= 0) & (x < w))[None, :]
        new = jnp.where(valid, cur + pred, jnp.zeros_like(cur))
        return (new, prev1), new

    (_, _), cols_out = jax.lax.scan(
        step,
        (jnp.zeros((b, h), res.dtype), jnp.zeros((b, h), res.dtype)),
        jnp.arange(w + h - 1),
    )
    # cols_out: [W+H-1, B, H] skewed columns; unskew back to [B, H, W]
    skew_full = jnp.moveaxis(cols_out, 0, 2)  # [B, H, W+H-1]
    return skew_full[:, rows, cols + rows]


cg2d_decode = jax.jit(_cg2d_decode_impl)


@jax.jit
def up_encode(plane: jax.Array) -> jax.Array:
    """North-prediction residual: row 0 verbatim, rows y: x[y]-x[y-1] mod 256."""
    n = jnp.roll(plane, 1, axis=1)
    res = plane - n
    rows = jnp.arange(plane.shape[1])[None, :, None]
    return jnp.where(rows == 0, plane, res)


@jax.jit
def up_decode(res: jax.Array) -> jax.Array:
    """Inverse of :func:`up_encode`: mod-256 cumulative sum down columns.

    uint8 addition is associative mod 256, so XLA's parallel prefix-sum
    applies — O(log H) depth, no sequential scan.
    """
    return jnp.cumsum(res, axis=1, dtype=jnp.uint8).astype(jnp.uint8)
