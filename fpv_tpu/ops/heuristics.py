"""Batched on-device histogramming.

The FPV1 compat path's predictor decisions (fusion_power_video.cc:517-564)
run on host with exact Python integers (:mod:`fpv_tpu.models.heuristics`) to
preserve the reference's int32/uint64 quirks; the FPVT profile makes its
decisions inside the fused model step (fpv_tpu.api.fpvt_codec) from sampled
residual costs.  This module only provides the exact batched histogram used
for rANS table construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
