"""Per-temporal-class frequency tables study (round-5 verdict item 7).

The shipped format codes every plane batch with ONE shared frequency
table (order-0) / one shared ctx16 table — the same single-static-table
stance as the reference (fusion_power_video.cc:517-544), amortized per
batch.  But a v5 batch mixes residuals of two temporal classes:
static/frame0-delta frames and prev-frame chain frames, whose statistics
differ (prev residuals are tighter around zero on drifting content).
Would per-class tables (one per temporal class, +512 wire bytes per
extra table per plane, format/fpvt.py:184-189) recover >= 1%?

Method: run the SHIPPED decision procedure (temporal pick by exact
wraparound-|residual| with PREV_ANCHOR barring, then per-frame spatial
pick, exactly examples/temporal_study.py's "prev" mode), then price the
chosen residual planes two ways:

* shared:  one batch entropy over all frames           + 1 table
* split2:  entropy per temporal class {static+delta, prev}  + 2 tables
* split3:  entropy per pick {none, frame0-delta, prev}      + 3 tables

Entropies are shared-table order-0 batch entropies (the rANS coder's
size up to the table constant); table cost is the wire-exact 512 B per
additional table actually present.  Low plane priced order-0 like the
temporal study (identical across variants, so deltas isolate the table
split).

Run: JAX_PLATFORMS=cpu python examples/class_tables_study.py [--fast]
     [--size N D]
Recorded result: see the docnote in main() and docs/ROUND5.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from temporal_study import (  # noqa: E402
    best_spatial,
    entropy_bits,
    pan_frames,
    wrap_cost,
)

TABLE_BITS = 512 * 8  # wire bytes per frequency table (format/fpvt.py:184)


def picked_residuals(plane: np.ndarray, delta: np.ndarray,
                     spatial: bool = True):
    """The shipped v5 decision procedure (temporal_study.code_plane,
    mode="prev"), returning (chosen residual planes [B,H,W], pick [B])
    with pick in {0: none, 1: frame0-delta, 2: prev}."""
    from fpv_tpu.api.fpvt_codec import PREV_ANCHOR

    b = plane.shape[0]
    p16 = plane.astype(np.int16)
    prev = np.concatenate([delta[None], plane[:-1]], axis=0)
    cands = np.stack([
        plane,
        ((p16 - delta.astype(np.int16)) % 256).astype(np.uint8),
        ((p16 - prev.astype(np.int16)) % 256).astype(np.uint8),
    ])
    costs = np.stack([wrap_cost(c) for c in cands]).astype(np.float64)
    costs[2:, ::PREV_ANCHOR] = np.inf  # anchors: no chain candidates
    pick = costs.argmin(axis=0)
    chosen = cands[pick, np.arange(b)]
    if spatial:
        chosen = best_spatial(chosen)
    return chosen, pick


def price(chosen: np.ndarray, pick: np.ndarray, groups) -> float:
    """Total bits for the batch coded with one table per GROUP of picks
    (a group with no frames costs nothing), incl. wire table cost."""
    total = 0.0
    for g in groups:
        sel = np.isin(pick, g)
        if sel.any():
            total += entropy_bits(chosen[sel]) + TABLE_BITS
    return total


def study(name: str, frames: np.ndarray, shift: int) -> dict:
    import jax.numpy as jnp

    from fpv_tpu.ops.preview import generate_preview

    imgs = (frames.astype(np.uint16) << shift).astype(np.uint16)
    high = (imgs >> 8).astype(np.uint8)
    low = (imgs & 0xFF).astype(np.uint8)
    pv = np.asarray(generate_preview(jnp.asarray(high)))
    shared = split2 = split3 = 0.0
    nprev = 0
    for plane, delta, spatial in (
        (high, high[0], True), (low, low[0], False),
    ):
        chosen, pick = picked_residuals(plane, delta, spatial)
        nprev += int((pick == 2).sum())
        shared += price(chosen, pick, [(0, 1, 2)])
        split2 += price(chosen, pick, [(0, 1), (2,)])
        split3 += price(chosen, pick, [(0,), (1,), (2,)])
    # previews: static-only in the format, identical under every variant
    pvb = entropy_bits(best_spatial(pv)) + TABLE_BITS
    shared += pvb
    split2 += pvb
    split3 += pvb
    return {
        "corpus": name,
        "prev_frames": nprev,
        "shared_bits": shared,
        "split2_bits": split2,
        "split3_bits": split3,
        "split2_save_pct": 100.0 * (1 - split2 / shared) if shared else 0.0,
        "split3_save_pct": 100.0 * (1 - split3 / shared) if shared else 0.0,
    }


def main():
    from fpv_tpu.utils import testdata

    n, d = (4, 128) if "--fast" in sys.argv else (16, 512)
    if "--size" in sys.argv:
        i = sys.argv.index("--size")
        n, d = int(sys.argv[i + 1]), int(sys.argv[i + 2])
    rng = np.random.default_rng(0)
    pl = testdata.plasma_frames(n, d, d, bits=12, seed=5).astype(np.int32)
    dark = rng.poisson(50, (n, d, d)).astype(np.uint16)
    dark[rng.random((n, d, d)) < 1e-4] = 4000
    corpora = [
        ("plasma12s", testdata.plasma_frames(n, d, d, bits=12, seed=5), 4),
        ("mixed12", np.clip(pl + rng.normal(0, 8, pl.shape), 0, 4095)
         .astype(np.uint16), 4),
        ("dark12", dark, 4),
        ("drift12", np.stack([np.roll(pl[0], (i, i), (0, 1))
                              for i in range(n)]).astype(np.uint16), 4),
        ("pan12", pan_frames(n, d), 4),
    ]
    # DOCNOTE (recorded result, 16x512x512): per-class tables DO measure
    # a real size win — split2 {static+delta | prev}: plasma +0.92%,
    # drift +0.72%, pan +1.45%; split3 (per pick): mixed +1.52%, dark
    # +3.81%, pan +2.08% — the classes' residual stats differ enough to
    # beat the 512 B/table wire cost.  NOT SHIPPED, with the trade
    # recorded: the block layout interleaves lanes across the flat
    # symbol stream, so symbols of every class mix within one decode
    # step; in-kernel per-class tables mean a per-step class select over
    # a 3x-row fused gather tree (tables already cost ~12% of step time
    # -> est. +15-25% decode step cost for ~1% avg size), and the
    # alternative (per-class sub-streams, whole frames regrouped) makes
    # stream shapes a function of per-batch class membership — a compile
    # variant per class-split signature in the one-program design.  The
    # single shared table stands as a measured engineering decision
    # (decode throughput is the headline), not as a claim the win is
    # zero.  See docs/ROUND5.md.
    print(f"{'corpus':<10} {'prevN':>5} {'shared kB':>10} {'split2 kB':>10} "
          f"{'save%':>7} {'split3 kB':>10} {'save%':>7}")
    for name, frames, shift in corpora:
        r = study(name, frames, shift)
        print(f"{r['corpus']:<10} {r['prev_frames']:>5} "
              f"{r['shared_bits']/8192:10.1f} {r['split2_bits']/8192:10.1f} "
              f"{r['split2_save_pct']:7.2f} {r['split3_bits']/8192:10.1f} "
              f"{r['split3_save_pct']:7.2f}")


if __name__ == "__main__":
    main()
