"""Falsifiable bound analysis of the rANS decode step loop.

Round-3 A/B eliminations (density-packed tables, prob_bits=10, NSUB, kernel
splits — docs/ROUND3.md item 5) led to the CLAIM that the decode kernel is
bound by the serial state->renorm dependency chain, with the VLIW scheduler
hiding the table gathers.  This module makes that claim measurable instead
of asserted:

* ``T_full``  — step time of the production decode kernel.
* ``T_chain`` — step time of a replica with the table gathers replaced by
  arithmetic stand-ins of the same dependency shape
  (``decode_pallas(stub_tables=True)``); everything else, including the
  renorm rank + word-window machinery, is identical.
* ``T_core``  — replica with the rank/window machinery also replaced
  (``stub_window=True``): the bare state arithmetic + cross-lane renorm
  reduction chain.

``decode_bound_fraction = T_chain / T_full``.  >= 0.85 means the gathers
are indeed hidden and the kernel runs at its dependency-chain bound — the
plateau is real and only a chain-shortening redesign can move it.  A LOW
fraction falsifies the claim: the gathers are on the critical path and
table-layout work has headroom after all.  ``T_core / T_full`` further
splits the chain into state arithmetic vs renorm-bookkeeping cost.

The stream under test is built by the production ``encode_plane_batch``
and the replicas take their launch arguments from the production
``pallas_decode_args`` — same grid, block specs, chunk geometry, and VMEM
scratch by construction.  See docs/DECODE_BOUND.md for the numbers and
the per-step op inventory.

This replaces, as the performance story, the reference's sequential
per-pixel decode loop (fusion_power_video.cc:326-333).
"""

from __future__ import annotations

import time

import numpy as np

import jax

from fpv_tpu.ops import rans_pallas as rp


def _build_args(nblocks: int, seed: int = 0):
    """Encode a synthetic high plane through the production codec path.

    Content mimics post-CG high-plane residuals (plasma-like: small
    mostly-positive values with a heavy zero mode) so the replicas time a
    realistic renorm density.  Returns production decode_pallas (args,
    kwargs) plus the symbol count.
    """
    from fpv_tpu.entropy import plane_codec as pc

    rng = np.random.default_rng(seed)
    n = nblocks * pc.DEFAULT_CHUNK_LEN * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    plane = plane.reshape(1, -1)
    hist = np.bincount(plane.reshape(-1), minlength=256)
    stream = pc.encode_plane_batch(plane, hist, engine="pallas")
    args, kwargs = pc.pallas_decode_args(stream)
    args = tuple(jax.block_until_ready(a) for a in args)
    return args, kwargs, n


def _time_decode(args, kwargs, *, reps: int = 5, **kw) -> float:
    """Best-of-N wall time of one decode_pallas call (seconds)."""
    return _time_interleaved([(args, kwargs, kw)], reps=reps)[0]


def _time_interleaved(variants, *, reps: int = 5) -> list[float]:
    """Best-of-N wall times, measured ROUND-ROBIN across the variants.

    The attached device's step time drifts by >+-5% over tens of seconds
    (thermal / tunnel neighbors); sequential per-variant timing folds that
    drift into the comparison (observed: a strictly-less-work stub
    measuring SLOWER than the full kernel).  Interleaving puts every
    variant under the same drift.
    """

    def run(v):
        args, kwargs, kw = v
        out, _ok = rp.decode_pallas(*args, **kwargs, **kw)
        jax.block_until_ready(out)

    for v in variants:
        run(v)  # compile
    best = [float("inf")] * len(variants)
    for _ in range(reps):
        for i, v in enumerate(variants):
            t0 = time.time()
            run(v)
            best[i] = min(best[i], time.time() - t0)
    return best


def bound_report(nblocks: int = 64, reps: int = 5) -> dict:
    """Measure T_full / T_chain / T_core on production launch configs.

    Returns a dict with per-step nanoseconds (a "step" = one fori_loop
    iteration decoding NSUB x 8 x 128 symbols in one grid cell; cells in
    the same grid pass run concurrently across the decode units, so the
    per-step figure is wall time / steps-per-grid-cell), the bound
    fraction, and the chain-ceiling throughput of the current design.
    """
    args, kwargs, syms_total = _build_args(nblocks)
    k = kwargs["chunk_len"]
    nsteps = k  # fori_loop iterations per grid cell (kseg*nseg)
    t_full, t_chain, t_core = _time_interleaved(
        [
            (args, kwargs, {}),
            (args, kwargs, {"stub_tables": True}),
            (args, kwargs, {"stub_tables": True, "stub_window": True}),
        ],
        reps=reps,
    )
    return {
        "nblocks": kwargs["nblocks"],
        "chunk_len": k,
        "steps_per_cell": nsteps,
        "grid_cells": kwargs["nblocks"] // rp.NSUB,
        "step_full_ns": 1e9 * t_full / nsteps,
        "step_chain_ns": 1e9 * t_chain / nsteps,
        "step_core_ns": 1e9 * t_core / nsteps,
        "decode_bound_fraction": t_chain / t_full,
        "core_fraction": t_core / t_full,
        "full_msym_s": syms_total / 1e6 / t_full,
        "chain_ceiling_msym_s": syms_total / 1e6 / t_chain,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(bound_report(), indent=2))
