"""Batched preview generation (fusion_power_video.cc:491-515)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def generate_preview(high: jax.Array) -> jax.Array:
    """[B, H, W] uint8 high planes -> [B, H//4, W//4] previews.

    4x4 box filter over the high plane, ``(sum / 16) & 0xfe`` (LSB cleared).
    Only complete 4x4 blocks contribute (floor semantics).
    """
    b, h, w = high.shape
    ph, pw = h // 4, w // 4
    blocks = high[:, : ph * 4, : pw * 4].astype(jnp.uint32)
    blocks = blocks.reshape(b, ph, 4, pw, 4)
    sums = blocks.sum(axis=(2, 4))
    return ((sums // 16) & 0xFE).astype(jnp.uint8)
