"""Batched byte-plane ops on device: split / combine / unextract.

JAX versions of the reference's frame import/export inner loops
(fusion_power_video.cc:370-489, 850-862), operating on ``[B, H, W]`` uint16
batches.  ``shift`` and ``big_endian`` are static (part of the stream config),
so each configuration jit-specializes to a branch-free elementwise program
that XLA fuses into one VPU pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def validate_shift(shift: int, big_endian: bool) -> None:
    """Reject shift configurations no split implementation defines.

    Big-endian shifts above 8 drive the reference's rotate path
    (fusion_power_video.cc:405-417) into a NEGATIVE shift count — C++ UB,
    numpy OverflowError, XLA implementation-defined.  Rather than three
    engines silently disagreeing, every split entry point rejects the
    configuration up front (deliberate, documented divergence from the
    reference, which accepts it and corrupts)."""
    if not 0 <= shift <= 16:
        raise ValueError(f"shift must be in [0, 16], got {shift}")
    if big_endian and shift > 8:
        raise ValueError(
            "big-endian shifts above 8 are not supported (the reference's "
            "rotate path shifts by a negative amount there)"
        )


def validate_u8_config(shift: int, big_endian: bool) -> None:
    """8-bit direct input is only decodable under shift=8 little-endian.

    The container records no bit depth (FPV1 has no depth field at all;
    FPVT records ``shift``), so a uint8 frame must ride the shift==8
    single-plane layout for decode-side unextract to return the original
    samples.  Session layers call this before accepting uint8 frames."""
    if shift != 8 or big_endian:
        raise ValueError(
            "uint8 frames require a shift=8 little-endian stream "
            f"(got shift={shift}, big_endian={big_endian}); widen to "
            "uint16 yourself for other configurations"
        )


def resolve_u8_shift(dtype, shift: int, big_endian: bool) -> int:
    """Auto-select shift=8 for uint8 input at the file-level encoders.

    shift==0 (the default) promotes to 8; an explicit shift must already
    be 8.  Returns the effective shift."""
    if np.dtype(dtype) != np.uint8:
        return shift
    if shift == 0:
        shift = 8
    validate_u8_config(shift, big_endian)
    return shift


@functools.partial(jax.jit, static_argnames=("shift", "big_endian"))
def split_planes(img: jax.Array, shift: int = 0, big_endian: bool = False):
    """uint16 [B, H, W] -> (high u8, low u8, nonzero_low bool[B]).

    Replicates the six import paths of Frame's ctor exactly, including the
    rotate-based combined endian-swap + shift formula
    (fusion_power_video.cc:405-417) whose low-byte garbage bits differ from
    an idealized byteswap-then-shift for malformed inputs.  For ``shift==8``
    the low plane is all-zero and callers must treat it as absent
    (fusion_power_video.cc:399-403, 429-433).
    """
    validate_shift(shift, big_endian)
    if img.dtype == jnp.uint8:
        # 8-bit direct input (Frame's uint8 ctor,
        # fusion_power_video.cc:453-465): sample bytes are the high plane,
        # no low plane.  Equals the uint16 LE shift==8 split of the widened
        # image; callers configure the stream as shift=8 little-endian.
        # Keeping the upload uint8 halves host->device traffic.
        high = img
        low = jnp.zeros_like(img)
        return high, low, jnp.zeros(img.shape[0], dtype=jnp.bool_)
    img = img.astype(jnp.uint16)
    if big_endian:
        if shift == 0:
            high = (img & 0xFF).astype(jnp.uint8)
            low = (img >> 8).astype(jnp.uint8)
        elif shift == 8:
            high = (img >> 8).astype(jnp.uint8)
            low = jnp.zeros_like(high)
        else:
            high = ((img << shift) | (img >> (16 - shift))).astype(jnp.uint8)
            low = (img >> (8 - shift)).astype(jnp.uint8)
    else:
        if shift == 0:
            high = (img >> 8).astype(jnp.uint8)
            low = (img & 0xFF).astype(jnp.uint8)
        elif shift == 8:
            high = img.astype(jnp.uint8)
            low = jnp.zeros_like(high)
        else:
            # shift == 16 would shift by the full bit width (undefined in
            # XLA); the reference's C++ truncation yields zeros — make that
            # explicit
            shifted = (
                (img << shift).astype(jnp.uint16)
                if shift < 16
                else jnp.zeros_like(img)
            )
            high = (shifted >> 8).astype(jnp.uint8)
            low = shifted.astype(jnp.uint8)
    if shift == 8:
        nonzero_low = jnp.zeros(img.shape[0], dtype=jnp.bool_)
    else:
        nonzero_low = jnp.any(low != 0, axis=(1, 2))
    return high, low, nonzero_low


@jax.jit
def combine_planes(high: jax.Array, low: jax.Array) -> jax.Array:
    """(high, low) u8 planes -> uint16 image (fusion_power_video.cc:341-343)."""
    return (high.astype(jnp.uint16) << 8) | low.astype(jnp.uint16)


@jax.jit
def combine_planes_delta(
    high: jax.Array, low: jax.Array, delta_high: jax.Array, delta_low: jax.Array
) -> jax.Array:
    """Delta-add + combine (fusion_power_video.cc:335-339), uint8 wraparound."""
    hi = high + delta_high  # uint8 wrap
    lo = low + delta_low
    return (hi.astype(jnp.uint16) << 8) | lo.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("shift", "big_endian"))
def unextract(img: jax.Array, shift: int = 0, big_endian: bool = False) -> jax.Array:
    """uint16 [B, H, W] -> raw uint16 words as the camera emitted them.

    Inverse of the import path (fusion_power_video.cc:850-862): shift right,
    then byte-swap for big-endian streams.  Returns uint16 words whose
    *memory bytes* equal the original raw stream on a little-endian host.
    """
    u = (img.astype(jnp.uint16) >> shift).astype(jnp.uint16)
    if big_endian:
        u = ((u << 8) | (u >> 8)).astype(jnp.uint16)
    return u
