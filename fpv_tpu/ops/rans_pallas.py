"""Pallas TPU kernels for the block-interleaved rANS coder.

One grid cell processes one lane block (1024 chunks as an [8, 128] tile)
through all K symbol steps with a ``fori_loop``.  Everything lives in VMEM;
per-symbol table lookups use the hardware's 128-lane dynamic gather
(``take_along_axis`` axis=1, lowered to tpu.dynamic_gather), and the word
stream advances with a scalar pointer — groups are written/read as dynamic
row windows, so no per-lane stream cursors exist anywhere.

Per-step building blocks (all [8, 128] vector ops):

* ``_lookup256``: 256-entry u32 table -> 2 dynamic gathers + select;
* ``_lookup_sym``: 4096-slot symbol table packed 4 u8/u32 into [8, 128] ->
  8 row gathers + select tree + byte extract;
* row-major group ranks via Hillis-Steele cumsums (static rolls);
* group packing (encode): per-row binary-search compaction (7 gather
  rounds), then one dynamic-roll row store per sublane row;
* group expansion (decode): one 16-row dynamic window load + 9
  relative-row select gathers.

The stream layout matches fpv_tpu.ops.rans_numpy bit for bit (tested in
interpret mode against it): per block, word groups in DESCENDING symbol
order (encoder writes forward; decoder consumes backward from the block's
word count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpv_tpu.ops.rans_layout import (
    BLOCK_COLS,
    BLOCK_LANES,
    BLOCK_ROWS,
    CTX_ALPHA,
    CTX_PROB_BITS,
    CTX_PROB_SCALE,
    PROB_BITS,
    PROB_SCALE,
    RANS_L,
    SEG_LEN,
    num_segments,
)


def _lanes() -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_COLS), 1)


def _rows() -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_COLS), 0)


def _bcast_row(row: jax.Array) -> jax.Array:
    """[1, 128] -> [8, 128] broadcast."""
    return jnp.broadcast_to(row, (BLOCK_ROWS, BLOCK_COLS))


def _lookup256(tab2: jax.Array, idx: jax.Array) -> jax.Array:
    """256-entry u32 table given as [2, 128]; idx int32 [8,128] in [0,256)."""
    col = idx & 127
    g0 = jnp.take_along_axis(_bcast_row(tab2[0:1]), col, axis=1)
    g1 = jnp.take_along_axis(_bcast_row(tab2[1:2]), col, axis=1)
    return jnp.where(idx < 128, g0, g1)


def _lookup_tab(tab: jax.Array, idx: jax.Array) -> jax.Array:
    """[R,128] u32 table; idx int32 [8,128] in [0, R*128): R-row select tree
    of independent gathers."""
    rows = tab.shape[0]
    if rows == 2:
        return _lookup256(tab, idx)
    col = idx & 127
    row = idx >> 7
    out = jnp.zeros(idx.shape, jnp.uint32)
    for r in range(rows):
        g = jnp.take_along_axis(_bcast_row(tab[r : r + 1]), col, axis=1)
        out = jnp.where(row == r, g, out)
    return out


def _lookup_fused(tab: jax.Array, slot: jax.Array) -> jax.Array:
    """slot [8,128] in [0, rows*128) -> full u32 entry, 1 entry/u32.

    Used by the fused-table decode path (one slot-indexed gather replacing
    the dependent slot->sym->fc gather PAIR).  The rans_bound measurement
    showed the step loop pays the serial latency of that pair, not gather
    issue count (prob_bits 12->10->8 row sweeps moved nothing), so this
    trades 3x more row gathers — issued in parallel, latency-hidden — for
    one less gather on the critical chain.  The select tree is merged as a
    balanced OR reduction (log2 depth) instead of a linear where chain so
    the merge itself stays off the chain too.
    """
    rows = tab.shape[0]
    col = slot & 127
    row = slot >> 7
    parts = [
        jnp.where(
            row == r,
            jnp.take_along_axis(_bcast_row(tab[r : r + 1]), col, axis=1),
            jnp.uint32(0),
        )
        for r in range(rows)
    ]
    while len(parts) > 1:
        parts = [
            parts[i] | parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def _lookup_sym(
    sym_tab: jax.Array, slot: jax.Array, nrows: int = BLOCK_ROWS
) -> jax.Array:
    """slot [8,128] in [0, nrows*512) -> symbol, bytes packed 4/u32 across
    the first ``nrows`` rows of a [8,128] u32 table (nrows = scale/512, so
    smaller prob_bits need proportionally fewer row gathers per step)."""
    word_idx = slot >> 2  # [0, nrows*128)
    row = word_idx >> 7  # [0, nrows)
    col = word_idx & 127
    out = jnp.zeros(slot.shape, jnp.uint32)
    for r in range(nrows):
        g = jnp.take_along_axis(_bcast_row(sym_tab[r : r + 1]), col, axis=1)
        out = jnp.where(row == r, g, out) if nrows > 1 else g
    byte = (slot & 3).astype(jnp.uint32)
    return ((out >> (byte * 8)) & 0xFF).astype(jnp.int32)


def _lookup_sym_nib(sym_tab4: jax.Array, slot: jax.Array) -> jax.Array:
    """slot [8,128] in [0,4096) -> NIBBLE symbol, 8 nibbles/u32 in [4,128].

    The ctx mode's symbols are 4-bit, so its slot->symbol table packs twice
    as dense as the byte table: 4 row gathers instead of 8 (gather issue
    slots dominate the decode step loop).
    """
    word_idx = slot >> 3  # [0, 512)
    row = word_idx >> 7  # [0, 4)
    col = word_idx & 127
    out = jnp.zeros(slot.shape, jnp.uint32)
    for r in range(4):
        g = jnp.take_along_axis(_bcast_row(sym_tab4[r : r + 1]), col, axis=1)
        out = jnp.where(row == r, g, out)
    nib = (slot & 7).astype(jnp.uint32)
    return ((out >> (nib * 4)) & 0xF).astype(jnp.int32)


def _lookup_fc_pair(fc2: jax.Array, idx: jax.Array) -> jax.Array:
    """idx [8,128] in [0,512) -> 14-bit fc entry, 2 entries/u32 in [2,128].

    Ctx-mode fc entries are (f-1) | cum<<7 <= 14 bits, so pairs pack into
    one u32: 2 row gathers instead of 4.
    """
    word_idx = idx >> 1  # [0, 256)
    col = word_idx & 127
    g0 = jnp.take_along_axis(_bcast_row(fc2[0:1]), col, axis=1)
    g1 = jnp.take_along_axis(_bcast_row(fc2[1:2]), col, axis=1)
    out = jnp.where(word_idx < 128, g0, g1)
    sh = (idx & 1).astype(jnp.uint32) * 16
    return (out >> sh) & 0x3FFF


def _row_cumsum(m: jax.Array) -> jax.Array:
    """Within-row inclusive cumsum of an int32 [8,128] via ONE MXU matmul.

    ``out[r,c] = sum_{c2<=c} m[r,c2] = (m @ T)[r,c]`` with T the
    upper-triangular ones matrix.  Values are small counts (<=128), exact
    in f32.  Replaces a 7-round Hillis-Steele roll chain: lane rotates go
    through the cross-lane permute unit (~100 cycles each) and sat on the
    decode/encode kernels' critical paths — the matmul form measured +37%
    encode and +41% decode kernel throughput, bit-identical streams.
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_COLS, BLOCK_COLS), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_COLS, BLOCK_COLS), 1)
    t = (ii <= jj).astype(jnp.float32)
    out = jax.lax.dot_general(
        m.astype(jnp.float32), t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32)


def _row_excl_prefix(row_tot: jax.Array) -> jax.Array:
    """Exclusive cumsum across the 8 sublane rows of a row-constant [8,128],
    as an [8,8] strictly-lower-triangular MXU matmul (see _row_cumsum)."""
    i8 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 0)
    j8 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 1)
    s8 = (i8 > j8).astype(jnp.float32)
    out = jax.lax.dot_general(
        s8, row_tot.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32)


def _pack_rows(values: jax.Array, incl: jax.Array) -> jax.Array:
    """Compact masked lanes of each row to its front, preserving order.

    ``incl`` is the within-row inclusive cumsum of the mask.  Output position
    i takes the lane src = min{col : incl[col] >= i+1} (garbage beyond each
    row's count).  4-ary search: 4 rounds of THREE independent probes beat
    7 rounds of one — dynamic gathers cost ~80 cycles of latency but
    pipeline, so the serial chain length (not probe count) is what the
    symbol loop pays.
    """
    lane = _lanes()
    target = lane + 1
    # combo packs (word << 8 | incl) so the final probes return the VALUE
    # along with the cumsum — no separate value gather at the chain's end
    combo = (values.astype(jnp.int32) << 8) | incl
    lo = jnp.zeros(values.shape, jnp.int32)
    for w in (16, 2):
        c = jnp.zeros(values.shape, jnp.int32)
        for i in range(1, 8):
            pv = (
                jnp.take_along_axis(
                    combo, jnp.minimum(lo + i * w, 127), axis=1
                )
                & 0xFF
            )
            c = c + (pv < target).astype(jnp.int32)
        lo = lo + w * c
    p1 = jnp.take_along_axis(combo, jnp.minimum(lo + 1, 127), axis=1)
    p2 = jnp.take_along_axis(combo, jnp.minimum(lo + 2, 127), axis=1)
    chosen = jnp.where((p1 & 0xFF) >= target, p1, p2)
    out = jnp.where(incl[:, 0:1] >= target, combo[:, 0:1], chosen)
    return ((out >> 8) & 0xFFFF).astype(values.dtype)


def _div_by_freq(
    x: jax.Array, f: jax.Array, inv: jax.Array, rounds: int = 1
) -> jax.Array:
    """Exact x // f via f32 reciprocal + fixup, for x < f << 19.

    With quotients < 2^19 (12-bit tables) the single-precision estimate
    ``u32(f32(x) * inv)`` is off by at most 1 and ``rounds=1`` suffices; for
    7-bit tables quotients reach 2^24 and the f32 relative error (~3*2^-24)
    admits drift up to ~3, so callers pass ``rounds=4``.  Still much cheaper
    on the VPU than a 32-bit magic-multiplier mulhi.
    """
    # route casts through int32 (x < 2^31, q < 2^31; Mosaic has no u32<->f32)
    xf = x.astype(jnp.int32).astype(jnp.float32)
    q = (xf * inv).astype(jnp.int32).astype(jnp.uint32)
    for _ in range(rounds):
        r = x - q * f  # mod-2^32; negative wraps high
        q = jnp.where(r.astype(jnp.int32) < 0, q - 1, q)
    for _ in range(rounds):
        r = x - q * f
        q = jnp.where(r >= f, q + 1, q)
    return q


def _ctx_from_prev(prev: jax.Array) -> jax.Array:
    """ctx = a*2 + (al != ar): lane-neighbor rolls of the previous step's
    (masked) symbols, wrapping within the block's 1024 lanes (rans_layout
    CTX docs; must match rans_numpy.ctx_from_prev)."""
    lane = _lanes()
    x1 = pltpu.roll(prev, 1, 1)
    al = jnp.where(lane == 0, pltpu.roll(x1, 1, 0), x1)
    x2 = pltpu.roll(prev, BLOCK_COLS - 1, 1)
    ar = jnp.where(
        lane == BLOCK_COLS - 1, pltpu.roll(x2, BLOCK_ROWS - 1, 0), x2
    )
    return prev * 2 + (al != ar).astype(jnp.int32)


NSUB = 2  # independent sub-blocks per grid cell (ILP: two dependency chains)
# Decode runs more chains per cell: with the round-4 fused single-gather
# tables the decode step is latency- rather than issue-bound, and the
# rans_bound.nsub_report sweep (5 interleaved captures, order-0 AND ctx16,
# docs/ROUND4.md) had nsub=4 over nsub=2 in every one (median +3%).
# Encode keeps 2: nsub>=4 exceeds VMEM (the kseg syms tile adds ~2 MB per
# sub-block) and nsub=1 measured 6% SLOWER than 2 (nsub_encode_report).
NSUB_DEC = 4
# Decode VMEM guard: the per-cell words window is nsub * wrows rows of
# u32[128], and wrows tracks the stream's actual payload density
# (plane_codec rows_alloc).  Near-incompressible streams — raw policy
# disabled (FPV_TPU_RAW=0), or pre-v6 files that stored coded noise
# planes — reach wrows ~ kseg*8+48 = 4144, where nsub=4 exceeds the 16 MB
# scoped-vmem budget (measured: 16.30 MB at nsub*wrows = 16576).
# decode_pallas halves nsub until nsub*wrows fits this budget; raw-policy
# production streams stay <= ~8.2 bits/sym (~2100 rows) and keep nsub=4.
NSUB_WROWS_BUDGET = 12288


def decode_nsub(nsub: int, wrows: int) -> int:
    """Clamp the decode sub-block count so nsub*wrows fits the VMEM budget."""
    while nsub > 1 and nsub * wrows > NSUB_WROWS_BUDGET:
        nsub //= 2
    return nsub


def _encode_kernel(
    *refs,
    chunk_len: int,
    kseg: int,
    nseg: int,
    prob_bits: int = PROB_BITS,
    ctx_mode: bool = False,
    nsub: int = NSUB,
):
    """One (cell, segment) grid step: encode ``kseg`` symbol steps of the
    cell's NSUB blocks into that segment's word region.

    Grid dim 1 walks segments in EXECUTION order g = 0..nseg-1, which maps
    to stream segment ``nseg-1-g`` (rANS encodes in reverse).  The per-chunk
    state carries across segments through ``states_ref`` (same block every
    g — it stays resident in VMEM), so a chunk of chunk_len = nseg*kseg
    symbols stores ONE u32 state while the kernel only ever tiles kseg
    steps of symbols in VMEM.

    Refs (grid dims squeezed): syms [NSUB, kseg, 8, 128] i32;
    lens [NSUB, 8, 128] (full chunk lengths); fc [R, 128] u32;
    ctx mode adds prevlast [NSUB, 8, 128] i32 (the symbol just before this
    segment, for the first step's context).  Outs: states [NSUB, 8, 128]
    u32 (carry + final), words [NSUB, Wrows, 128] u16 (per segment),
    count [NSUB, 1] i32 SMEM (per segment).
    """
    if ctx_mode:
        (syms_ref, lens_ref, fc_ref, prevlast_ref,
         states_ref, words_ref, count_ref) = refs
    else:
        syms_ref, lens_ref, fc_ref, states_ref, words_ref, count_ref = refs
        prevlast_ref = None
    fmask = (1 << prob_bits) - 1
    renorm_shift = 31 - prob_bits
    div_rounds = 1 if prob_bits >= 12 else 4
    lens = [lens_ref[u] for u in range(nsub)]
    fc = fc_ref[:]
    g = pl.program_id(1)
    seg_lo = (nseg - 1 - g) * kseg  # global j of this segment's first symbol
    win_rows = 4 * BLOCK_ROWS  # 32-row window, u16-tile (16,128) aligned
    wrow_id = jax.lax.broadcasted_iota(jnp.int32, (win_rows, BLOCK_COLS), 0)
    wlane = jax.lax.broadcasted_iota(jnp.int32, (win_rows, BLOCK_COLS), 1)

    # chunk-state carry: fresh at the first executed segment (the chunk's
    # LAST symbols), otherwise continue from the previous segment's states
    @pl.when(g == 0)
    def _():
        for u in range(nsub):
            states_ref[u] = jnp.full(
                (BLOCK_ROWS, BLOCK_COLS), RANS_L, dtype=jnp.uint32
            )

    def advance(u, t, x, e):
        """State update + group pack for step t (no stream writes).

        Returns (x', packed words [8,128] u32, per-row counts broadcast
        [8,128] i32)."""
        j = seg_lo + (kseg - 1 - t)
        f = (e & fmask) + 1
        cum = e >> prob_bits
        # IEEE division is correctly rounded, so this equals the host-side
        # f32 reciprocal table entry bit for bit
        inv = 1.0 / f.astype(jnp.int32).astype(jnp.float32)
        active = j < lens[u]
        emit = active & (x >= (f << renorm_shift))
        word = x & 0xFFFF  # packed as u32 (16-bit gathers unsupported)
        x2 = jnp.where(emit, x >> 16, x)
        q = _div_by_freq(x2, f, inv, rounds=div_rounds)
        xn = (q << prob_bits) + (x2 - q * f) + cum
        x = jnp.where(active, xn, x)
        incl = _row_cumsum(emit.astype(jnp.int32))
        packed = _pack_rows(word, incl)
        rowcnt = jnp.broadcast_to(
            incl[:, BLOCK_COLS - 1 :], (BLOCK_ROWS, BLOCK_COLS)
        )
        return x, packed, rowcnt

    def place(u, packed, rowcnt, ptr):
        """Append a packed word group at ptr (row-major row segments): one
        aligned 16-row read-modify-write window; row segments are placed
        with rolls + row selects."""
        al = (ptr >> 7) & ~15  # 16-row-aligned window base (u16 tiling)
        al = pl.multiple_of(al, 16)
        win = words_ref[u, pl.ds(al, win_rows), :]
        off = ptr - al * BLOCK_COLS  # word offset inside the window [0, 2048)
        for r in range(BLOCK_ROWS):
            cnt_r = jnp.sum(rowcnt[r : r + 1, :1])
            shift = off & 127
            rot = jnp.broadcast_to(
                pltpu.roll(packed[r : r + 1], shift, 1).astype(jnp.uint16),
                (win_rows, BLOCK_COLS),
            )
            d0 = off >> 7
            m0 = (wrow_id == d0) & (wlane >= shift) & (wlane < shift + cnt_r)
            m1 = (wrow_id == d0 + 1) & (wlane < shift + cnt_r - BLOCK_COLS)
            win = jnp.where(m0 | m1, rot, win)
            off = off + cnt_r
        words_ref[u, pl.ds(al, win_rows), :] = win
        return al * BLOCK_COLS + off

    def _prefetch(u, t):
        """Table row for sub-block u at step t (clamped at the end).

        In ctx mode the kernel input is nibble symbols and the fc index
        ctx*16+sym is computed here from the PREVIOUS step's symbols —
        avoiding a full-size precomputed index array in HBM.  At the
        segment's first step the previous symbol lives in the preceding
        segment; it is passed in as ``prevlast`` (zeros for the chunk's
        very first symbol, matching the encoder's zero padding)."""
        jl = jnp.maximum(kseg - 1 - t, 0)
        sym = syms_ref[u, pl.ds(jl, 1)][0]
        if ctx_mode:
            jp = jnp.maximum(jl - 1, 0)
            prev_in = syms_ref[u, pl.ds(jp, 1)][0]
            prev = jnp.where(jl >= 1, prev_in, prevlast_ref[u])
            sym = _ctx_from_prev(prev) * CTX_ALPHA + sym
        return _lookup_tab(fc, sym)

    def step(t, carry):
        """Two-stage software pipeline: this body computes step t's state
        update + pack (gather-latency-bound) while PLACING step t-1's word
        group (VPU/VMEM-bound) — independent work the VLIW scheduler can
        interleave."""
        xs, ptrs, pks, rcs, es = carry
        # issue next step's independent lookups first so they overlap the
        # state-update dependency chains
        es_next = tuple(_prefetch(u, t + 1) for u in range(nsub))
        adv = [advance(u, t, xs[u], es[u]) for u in range(nsub)]
        ptrs_new = tuple(
            place(u, pks[u], rcs[u], ptrs[u]) for u in range(nsub)
        )
        return (
            tuple(a[0] for a in adv),
            ptrs_new,
            tuple(a[1] for a in adv),
            tuple(a[2] for a in adv),
            es_next,
        )

    x0 = tuple(states_ref[u] for u in range(nsub))
    p0 = tuple(jnp.int32(0) for _ in range(nsub))
    e0 = tuple(_prefetch(u, 0) for u in range(nsub))
    pk0 = tuple(
        jnp.zeros((BLOCK_ROWS, BLOCK_COLS), jnp.uint32) for _ in range(nsub)
    )
    rc0 = tuple(
        jnp.zeros((BLOCK_ROWS, BLOCK_COLS), jnp.int32) for _ in range(nsub)
    )
    xs, ptrs, pks, rcs, _ = jax.lax.fori_loop(
        0, kseg, step, (x0, p0, pk0, rc0, e0)
    )
    for u in range(nsub):
        states_ref[u] = xs[u]
        # drain the pipeline: place the final step's word group
        count_ref[u, 0] = place(u, pks[u], rcs[u], ptrs[u])


def _decode_kernel(
    count_ref,  # [NSUB, 1] i32 (SMEM, per segment)
    states_ref,  # [NSUB, 8, 128] u32
    lens_ref,  # [NSUB, 8, 128] i32 (full chunk lengths)
    sym_ref,  # [8, 128] u32 packed symbol table
    fc_ref,  # [R, 128] u32
    words_ref,  # [NSUB, Wrows, 128] u32 (per segment)
    out_ref,  # out [NSUB, kseg//4, 8, 128] u32 (4 syms/word, per segment)
    ok_ref,  # out [NSUB, 8, 128] i32
    xscr,  # scratch [NSUB, 8, 128] u32: state carry across segments
    okscr,  # scratch [NSUB, 1] i32 (SMEM): per-segment ptr==0 accumulation
    prevscr,  # scratch [NSUB, 8, 128] i32 (ctx mode only; else unused)
    *,
    chunk_len: int,
    kseg: int,
    nseg: int,
    prob_bits: int = PROB_BITS,
    ctx_mode: bool = False,
    fused_tab: bool = False,
    slim_carry: bool = False,
    stub_tables: bool = False,
    stub_window: bool = False,
    stub_class: int = 0,
    nsub: int = NSUB_DEC,
):
    """``fused_tab`` selects the fused-table order-0 decode: sym_ref is a
    [32,128] u32 slot->entry table (fused_table_arrays) and fc_ref goes
    unread — one gather on the critical chain instead of the dependent
    slot->sym->fc pair (see _lookup_fused).

    ``stub_class`` (with fused_tab) is the per-temporal-class-tables
    latency model: sym_ref holds ``stub_class`` vertically tiled copies of
    the fused table and each lane adds a class offset to its slot index,
    so the gather tree is exactly the size a real per-class implementation
    would pay (the interleaved lane layout mixes all classes within every
    step) while the decoded output stays bit-identical (the copies are
    identical).  Measures the decode cost of class-splitting the shared
    frequency table (examples/class_tables_study.py) without a format
    change.

    ``stub_tables`` / ``stub_window`` build latency-model replicas of
    this kernel for ops.rans_bound (never used for real decoding): the
    serial state->renorm dependency chain is preserved exactly while the
    table gathers (claimed VLIW-hidden) and/or the word-window rank+select
    machinery are replaced by arithmetic stand-ins of the same dependency
    shape.  Comparing replica step time against the real kernel's makes
    the "decode is chain-bound" claim falsifiable (docs/DECODE_BOUND.md).
    """
    fmask = (1 << prob_bits) - 1
    scale = 1 << prob_bits
    lens = [lens_ref[u] for u in range(nsub)]
    sym_tab = sym_ref[:]
    fc = fc_ref[:]
    g = pl.program_id(1)  # decode walks segments in stream (ascending) order
    seg_lo = g * kseg

    @pl.when(g == 0)
    def _():
        for u in range(nsub):
            xscr[u] = states_ref[u]
            okscr[u, 0] = 1
            if ctx_mode:
                prevscr[u] = jnp.zeros(
                    (BLOCK_ROWS, BLOCK_COLS), jnp.int32
                )

    def one(u, jl, x, ptr, prev):
        # the word window depends ONLY on the carried ptr: load it first so
        # the VMEM read overlaps the whole lookup + rank dependency chain.
        # This step consumes at most 1024 words (8 rows), so rows
        # [(ptr>>7)-8, (ptr>>7)+8) cover every consumed position.
        al = jnp.maximum((ptr >> 7) - 8, 0)
        win = words_ref[u, pl.ds(al, 16), :]
        active = (seg_lo + jl) < lens[u]
        slot = (x & (scale - 1)).astype(jnp.int32)
        if stub_tables:
            # model stand-ins with the same chain shape (slot -> f/cum ->
            # xn) but no VMEM gathers; absolute values are irrelevant to
            # timing because every op below is unconditional
            sym = slot & 0xFF
            f = ((slot & (fmask >> 2)) + 1).astype(jnp.uint32)
            off = slot.astype(jnp.uint32) - f  # same shape as slot - cum
        elif fused_tab:
            # one slot-indexed gather yields (sym, f-1, off); ctx mode
            # packs 4/7/7 bits at shifts 0/4/11, order-0 packs 8/12/12 at
            # shifts 0/8/20 (ctx_fused_table_arrays / fused_table_arrays)
            sym_bits = 4 if ctx_mode else 8
            idx = (_ctx_from_prev(prev) * scale + slot) if ctx_mode else slot
            if stub_class:
                # per-lane class offset into the tiled table (see
                # docstring); one class's span = the un-tiled table size
                span = (sym_tab.shape[0] // stub_class) * BLOCK_COLS
                lane_cls = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (BLOCK_ROWS, BLOCK_COLS), 1
                    )
                    % stub_class
                )
                idx = lane_cls * span + idx
            e = _lookup_fused(sym_tab, idx)
            sym = (e & ((1 << sym_bits) - 1)).astype(jnp.int32)
            f = ((e >> sym_bits) & fmask) + 1
            off = e >> (sym_bits + prob_bits)
        elif ctx_mode:
            # ctx decode tables are density-packed (ctx_decode_table_arrays):
            # nibble symbols 8/u32 (rows 0-3) and 14-bit fc entries 2/u32 —
            # 6 row gathers per step instead of 12
            ctx = _ctx_from_prev(prev)
            sym = _lookup_sym_nib(sym_tab[:4], ctx * scale + slot)
            e = _lookup_fc_pair(fc, ctx * CTX_ALPHA + sym)
        else:
            sym = _lookup_sym(sym_tab, slot, max(1, scale >> 9))
            e = _lookup_tab(fc, sym)
        if not (stub_tables or fused_tab):
            f = (e & fmask) + 1
            off = slot.astype(jnp.uint32) - (e >> prob_bits)
        xn = f * (x >> prob_bits) + off
        renorm = active & (xn < RANS_L)
        if stub_window:
            # keep the chain through the cross-lane reduction and the
            # renorm merge, but replace the rank + word-window machinery
            # with a constant word
            cnt = jnp.sum(renorm.astype(jnp.int32))
            base = ptr - cnt
            xn2 = jnp.where(renorm, (xn << 16) | jnp.uint32(0x8000), xn)
            x = jnp.where(active, xn2, x)
            return x, base, sym, jnp.where(active, sym, 0)
        incl = _row_cumsum(renorm.astype(jnp.int32))
        row_tot = jnp.broadcast_to(
            incl[:, BLOCK_COLS - 1 :], (BLOCK_ROWS, BLOCK_COLS)
        )
        excl_rows = _row_excl_prefix(row_tot)
        rank = (incl - renorm.astype(jnp.int32)) + excl_rows
        cnt = jnp.sum(renorm.astype(jnp.int32))
        base = ptr - cnt
        pos = base + rank
        rel = (pos >> 7) - al
        col = pos & 127
        # balanced OR-merge (log2 depth) keeps the 9-row select off the
        # serial chain — the gathers themselves issue in parallel
        wp = [
            jnp.where(
                rel == r,
                jnp.take_along_axis(_bcast_row(win[r : r + 1]), col, axis=1),
                jnp.uint32(0),
            )
            for r in range(9)
        ]
        while len(wp) > 1:
            wp = [
                wp[i] | wp[i + 1] if i + 1 < len(wp) else wp[i]
                for i in range(0, len(wp), 2)
            ]
        w = wp[0]
        xn2 = jnp.where(renorm, (xn << 16) | (w & 0xFFFF), xn)
        x = jnp.where(active, xn2, x)
        # masked history for the context chain (padding decodes as 0,
        # matching the encoder's zero padding)
        prev_next = jnp.where(active, sym, 0)
        return x, base, sym, prev_next

    # slim_carry drops the prev-symbol history from the non-ctx loop carry
    # (it is only live in ctx mode).  MEASURED NEGATIVE: the interleaved A/B
    # had the slim variant 2.8% SLOWER — the extra carry evidently pads the
    # schedule rather than spilling — so the default keeps the full carry;
    # the flag stays for re-measurement on future toolchains.
    carry_prev = ctx_mode or not slim_carry
    zero_prev = jnp.zeros((BLOCK_ROWS, BLOCK_COLS), jnp.int32)

    def step(jl, carry):
        if carry_prev:
            xs, ptrs, accs, prevs = carry
        else:
            xs, ptrs, accs = carry
            prevs = (zero_prev,) * nsub
        sub = jl & 3
        new_xs, new_ptrs, new_accs, new_prevs = [], [], [], []
        for u in range(nsub):
            x, base, sym, prev_next = one(u, jl, xs[u], ptrs[u], prevs[u])
            acc = jnp.where(sub == 0, 0, accs[u])
            acc = acc | (sym.astype(jnp.uint32) << (8 * sub.astype(jnp.uint32)))
            @pl.when(sub == 3)
            def _(u=u, acc=acc):
                out_ref[u, pl.ds(jl >> 2, 1)] = acc[None]
            new_xs.append(x)
            new_ptrs.append(base)
            new_accs.append(acc)
            new_prevs.append(prev_next)
        out = (tuple(new_xs), tuple(new_ptrs), tuple(new_accs))
        return out + ((tuple(new_prevs),) if carry_prev else ())

    x0 = tuple(xscr[u] for u in range(nsub))
    p0 = tuple(count_ref[u, 0] for u in range(nsub))
    a0 = tuple(
        jnp.zeros((BLOCK_ROWS, BLOCK_COLS), jnp.uint32) for _ in range(nsub)
    )
    carry0 = (x0, p0, a0)
    if carry_prev:
        carry0 = carry0 + (
            tuple((prevscr[u] if ctx_mode else zero_prev)
                  for u in range(nsub)),
        )
    res = jax.lax.fori_loop(0, kseg, step, carry0)
    xs, ptrs = res[0], res[1]
    for u in range(nsub):
        xscr[u] = xs[u]
        okscr[u, 0] = okscr[u, 0] & (ptrs[u] == 0).astype(jnp.int32)
        if ctx_mode:
            prevscr[u] = res[3][u]

    @pl.when(g == nseg - 1)
    def _():
        for u in range(nsub):
            seg_ok = okscr[u, 0] == 1
            ok_ref[u] = (
                ((xscr[u] == RANS_L) & seg_ok) | (lens[u] == 0)
            ).astype(jnp.int32)


def table_arrays(freq: np.ndarray):
    """Host-side packed tables: (fc [2,128] u32, finv_bits [2,128] u32,
    sym_packed [8,128] u32).

    ``finv_bits`` are the f32 bit patterns of 1/freq (round-to-nearest),
    used by the encode kernel's exact reciprocal division.
    """
    freq = np.asarray(freq, dtype=np.uint32)
    cum = np.zeros(256, dtype=np.uint32)
    cum[1:] = np.cumsum(freq)[:-1]
    fc = ((np.maximum(freq, 1) - 1) & 0xFFF) | (cum << PROB_BITS)
    finv = (1.0 / np.maximum(freq, 1).astype(np.float32)).astype(np.float32)
    sym_of_slot = np.repeat(np.arange(256, dtype=np.uint32), freq.astype(np.int64))
    packed = np.zeros(PROB_SCALE // 4, dtype=np.uint32)
    for b in range(4):
        packed |= sym_of_slot[b::4] << np.uint32(8 * b)
    return (
        fc.reshape(2, 128).astype(np.uint32),
        finv.view(np.uint32).reshape(2, 128),
        packed.reshape(BLOCK_ROWS, BLOCK_COLS),
    )


def fused_table_arrays(
    freq: np.ndarray, prob_bits: int = PROB_BITS
) -> np.ndarray:
    """Order-0 DECODE table with one u32 entry per slot: [scale/128, 128].

    entry = off << (8+prob_bits) | (f-1) << 8 | sym, where off =
    slot - cum[sym] (the value the step loop otherwise derives as
    slot - cum).  off < f <= scale and f-1 < scale so the packing is exact
    for prob_bits <= 12.  One slot-indexed gather then yields everything
    the state update needs — see _lookup_fused for why this beats the
    denser two-table layout.  ``prob_bits`` != PROB_BITS is used only by
    the rans_bound fused-row sweep (the wire format pins 12).
    """
    freq = np.asarray(freq, dtype=np.uint32)
    scale = 1 << prob_bits
    assert freq.sum() == scale, (freq.sum(), scale)
    cum = np.zeros(256, dtype=np.uint32)
    cum[1:] = np.cumsum(freq)[:-1]
    sym_of_slot = np.repeat(
        np.arange(256, dtype=np.uint32), freq.astype(np.int64)
    )
    slots = np.arange(scale, dtype=np.uint32)
    off = slots - cum[sym_of_slot]
    f1 = freq[sym_of_slot] - 1
    entries = (
        (off << np.uint32(8 + prob_bits)) | (f1 << np.uint32(8))
        | sym_of_slot
    )
    return entries.reshape(scale // BLOCK_COLS, BLOCK_COLS)


def ctx_table_arrays(freq_ctx: np.ndarray):
    """Context-mode ENCODE tables: (fc [4,128] u32 = (f-1)|cum_within<<7,
    sym_packed [8,128] u32 covering NCTX*128 = 4096 slots)."""
    from fpv_tpu.ops.rans_numpy import ctx_tables

    freq32, cum, sym_of_slot = ctx_tables(freq_ctx)
    fc = ((np.maximum(freq32, 1) - 1) & ((1 << CTX_PROB_BITS) - 1)) | (
        cum << CTX_PROB_BITS
    )
    packed = np.zeros(len(sym_of_slot) // 4, dtype=np.uint32)
    sos = sym_of_slot.astype(np.uint32)
    for b in range(4):
        packed |= sos[b::4] << np.uint32(8 * b)
    return (
        fc.reshape(4, 128).astype(np.uint32),
        packed.reshape(BLOCK_ROWS, BLOCK_COLS),
    )


def ctx_fused_table_arrays(freq_ctx: np.ndarray) -> np.ndarray:
    """Ctx-mode DECODE table with one u32 entry per (ctx, slot): [32,128].

    Global index = ctx * 128 + slot; entry = off << 11 | (f-1) << 4 | sym
    (nibble sym 4b, 7-bit f-1 and off = slot - cum_within_ctx).  The fused
    single-gather layout — see fused_table_arrays / _lookup_fused.
    """
    from fpv_tpu.ops.rans_numpy import ctx_tables

    freq32, cum, sym_of_slot = ctx_tables(freq_ctx)
    n = len(sym_of_slot)  # CTX_NCTX * 128 = 4096
    idx = np.arange(n, dtype=np.uint32)
    ctxi = idx >> CTX_PROB_BITS
    sym = sym_of_slot.astype(np.uint32)
    pair = ctxi * CTX_ALPHA + sym
    f1 = freq32[pair].astype(np.uint32) - 1
    off = (idx & (CTX_PROB_SCALE - 1)) - cum[pair].astype(np.uint32)
    entries = (off << np.uint32(11)) | (f1 << np.uint32(4)) | sym
    return entries.reshape(n // BLOCK_COLS, BLOCK_COLS)


def ctx_decode_table_arrays(freq_ctx: np.ndarray):
    """Context-mode DECODE tables, density-packed for fewer row gathers:
    (fc_pairs [2,128] u32 — two 14-bit (f-1)|cum<<7 entries per word,
    sym_nib [8,128] u32 — 4096 nibble symbols 8/u32 in rows 0-3, rows 4-7
    zero so the array fits the kernel's uniform [8,128] table slot)."""
    from fpv_tpu.ops.rans_numpy import ctx_tables

    freq32, cum, sym_of_slot = ctx_tables(freq_ctx)
    fc = (
        ((np.maximum(freq32, 1) - 1) & ((1 << CTX_PROB_BITS) - 1))
        | (cum << CTX_PROB_BITS)
    ).astype(np.uint32)
    pairs = fc[0::2] | (fc[1::2] << np.uint32(16))  # 256 u32
    sos = sym_of_slot.astype(np.uint32)
    nib = np.zeros(len(sos) // 8, dtype=np.uint32)  # 512 u32
    for b in range(8):
        nib |= sos[b::8] << np.uint32(4 * b)
    sym8 = np.zeros((BLOCK_ROWS, BLOCK_COLS), np.uint32)
    sym8[:4] = nib.reshape(4, BLOCK_COLS)
    return pairs.reshape(2, 128), sym8


def words_rows(chunk_len: int) -> int:
    """Staging rows per (block, segment): worst case kseg*1024 words +
    window headroom."""
    kseg = min(chunk_len, SEG_LEN)
    return kseg * BLOCK_LANES // BLOCK_COLS + 48


def _auto_interpret(interpret: bool) -> bool:
    """Mosaic kernels only compile for TPU; on any other backend (CPU tests,
    the virtual multi-chip dryrun mesh) fall back to interpret mode."""
    return interpret or jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_len", "nblocks", "interpret", "prob_bits", "ctx_mode", "nsub",
    ),
)
def encode_pallas(
    syms: jax.Array,  # [nblocks, K, 8, 128] i32 (fc indices, or nibble
    #                   symbols when ctx_mode)
    lens: jax.Array,  # [nblocks, 8, 128] i32
    fc: jax.Array,  # [R, 128] u32
    chunk_len: int,
    nblocks: int,
    interpret: bool = False,
    prob_bits: int = PROB_BITS,
    ctx_mode: bool = False,
    nsub: int = NSUB,
):
    """Returns (states u32 [nblocks,8,128], words u16 [ngroups,Wrows,128],
    counts i32 [ngroups,1,1]) where ngroups = nblocks * num_segments(K):
    per-(block, segment) word regions in block-major order."""
    interpret = _auto_interpret(interpret)
    k = chunk_len
    kseg = min(k, SEG_LEN)
    nseg = num_segments(k)
    if nseg * kseg != k:
        raise ValueError("chunk_len > SEG_LEN must be a SEG_LEN multiple")
    wrows = words_rows(k)
    kernel = functools.partial(
        _encode_kernel, chunk_len=k, kseg=kseg, nseg=nseg,
        prob_bits=prob_bits, ctx_mode=ctx_mode, nsub=nsub,
    )
    # pad the block count to a NSUB multiple; pad sub-blocks are inactive
    # (all-zero lens) and emit nothing
    npad = (-nblocks) % nsub
    if npad:
        syms = jnp.concatenate(
            [syms, jnp.zeros((npad, k, BLOCK_ROWS, BLOCK_COLS), syms.dtype)]
        )
        lens = jnp.concatenate(
            [lens, jnp.zeros((npad, BLOCK_ROWS, BLOCK_COLS), lens.dtype)]
        )
    nb_pad = nblocks + npad
    ncells = nb_pad // nsub
    syms6 = syms.reshape(ncells, nsub, nseg, kseg, BLOCK_ROWS, BLOCK_COLS)
    lens4 = lens.reshape(ncells, nsub, BLOCK_ROWS, BLOCK_COLS)
    inputs = [syms6, lens4, fc]
    in_specs = [
        pl.BlockSpec(
            (None, nsub, None, kseg, BLOCK_ROWS, BLOCK_COLS),
            lambda m, g: (m, 0, nseg - 1 - g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((None, nsub, BLOCK_ROWS, BLOCK_COLS),
                     lambda m, g: (m, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((fc.shape[0], 128), lambda m, g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if ctx_mode:
        # the symbol just before each segment (for the first step's ctx):
        # segment g>0 -> syms[:, g*kseg-1]; zeros for segment 0
        prevlast = jnp.concatenate(
            [
                jnp.zeros((nb_pad, 1, BLOCK_ROWS, BLOCK_COLS), syms.dtype),
                syms[:, kseg - 1 :: kseg][:, : nseg - 1],
            ],
            axis=1,
        ).reshape(ncells, nsub, nseg, BLOCK_ROWS, BLOCK_COLS)
        inputs.append(prevlast)
        in_specs.append(
            pl.BlockSpec(
                (None, nsub, None, BLOCK_ROWS, BLOCK_COLS),
                lambda m, g: (m, 0, nseg - 1 - g, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    states, words, counts = pl.pallas_call(
        kernel,
        grid=(ncells, nseg),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, nsub, BLOCK_ROWS, BLOCK_COLS),
                         lambda m, g: (m, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, nsub, None, wrows, BLOCK_COLS),
                lambda m, g: (m, 0, nseg - 1 - g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # nseg ahead of nsub: Mosaic requires the block's last two dims
            # to equal the array's (the squeezed seg dim can't be trailing)
            pl.BlockSpec((None, None, nsub, 1),
                         lambda m, g: (m, nseg - 1 - g, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (ncells, nsub, BLOCK_ROWS, BLOCK_COLS), jnp.uint32
            ),
            jax.ShapeDtypeStruct(
                (ncells, nsub, nseg, wrows, BLOCK_COLS), jnp.uint16
            ),
            jax.ShapeDtypeStruct((ncells, nseg, nsub, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    # counts come out (cell, seg, sub); reorder to block-major (block, seg)
    counts_bm = jnp.transpose(counts, (0, 2, 1, 3))
    return (
        states.reshape(nb_pad, BLOCK_ROWS, BLOCK_COLS)[:nblocks],
        words.reshape(nb_pad * nseg, wrows, BLOCK_COLS)[: nblocks * nseg],
        counts_bm.reshape(nb_pad * nseg, 1, 1)[: nblocks * nseg],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_len", "nblocks", "interpret", "prob_bits", "ctx_mode",
        "fused_tab", "slim_carry", "stub_tables", "stub_window",
        "stub_class", "nsub",
    ),
)
def decode_pallas(
    counts: jax.Array,  # [ngroups, 1, 1] i32 (ngroups = nblocks * nseg)
    states: jax.Array,  # [nblocks, 8, 128] u32
    lens: jax.Array,  # [nblocks, 8, 128] i32
    sym_tab: jax.Array,  # [8, 128] u32
    fc: jax.Array,  # [R, 128] u32
    words: jax.Array,  # [ngroups, Wrows, 128] u32
    chunk_len: int,
    nblocks: int,
    interpret: bool = False,
    prob_bits: int = PROB_BITS,
    ctx_mode: bool = False,
    fused_tab: bool = False,
    slim_carry: bool = False,
    stub_tables: bool = False,
    stub_window: bool = False,
    stub_class: int = 0,
    nsub: int = NSUB_DEC,
):
    """Returns (symbols i32 [nblocks,K,8,128], ok i32 [nblocks,8,128]).

    With ``fused_tab`` the order-0 sym_tab argument must be the [32,128]
    fused_table_arrays layout (fc is still passed but goes unread).

    ``stub_tables``/``stub_window`` select the latency-model replica
    kernels used by ops.rans_bound (outputs are then meaningless);
    ``stub_class`` N models per-temporal-class tables (sym_tab must be N
    tiled copies; output stays bit-exact — see _decode_kernel)."""
    interpret = _auto_interpret(interpret)
    k = chunk_len
    kseg = min(k, SEG_LEN)
    nseg = num_segments(k)
    if nseg * kseg != k:
        raise ValueError("chunk_len > SEG_LEN must be a SEG_LEN multiple")
    wrows = words.shape[1]
    # VMEM guard (see NSUB_WROWS_BUDGET): dense streams get fewer
    # sub-blocks per cell instead of a compile-time scoped-vmem OOM.  The
    # lost ILP only affects streams that are payload-bandwidth-bound anyway.
    nsub = decode_nsub(nsub, wrows)
    kernel = functools.partial(
        _decode_kernel, chunk_len=k, kseg=kseg, nseg=nseg,
        prob_bits=prob_bits, ctx_mode=ctx_mode, fused_tab=fused_tab,
        slim_carry=slim_carry,
        stub_tables=stub_tables, stub_window=stub_window,
        stub_class=stub_class, nsub=nsub,
    )
    npad = (-nblocks) % nsub
    if npad:
        counts = jnp.concatenate(
            [counts, jnp.zeros((npad * nseg, 1, 1), counts.dtype)]
        )
        states = jnp.concatenate(
            [states,
             jnp.full((npad, BLOCK_ROWS, BLOCK_COLS), RANS_L, states.dtype)]
        )
        lens = jnp.concatenate(
            [lens, jnp.zeros((npad, BLOCK_ROWS, BLOCK_COLS), lens.dtype)]
        )
        words = jnp.concatenate(
            [words, jnp.zeros((npad * nseg, wrows, BLOCK_COLS), words.dtype)]
        )
    nb_pad = nblocks + npad
    ncells = nb_pad // nsub
    # counts arrive block-major (block, seg); the SMEM spec needs nsub last
    counts4 = jnp.transpose(
        counts.reshape(ncells, nsub, nseg, 1), (0, 2, 1, 3)
    )
    states4 = states.reshape(ncells, nsub, BLOCK_ROWS, BLOCK_COLS)
    lens4 = lens.reshape(ncells, nsub, BLOCK_ROWS, BLOCK_COLS)
    words5 = words.reshape(ncells, nsub, nseg, wrows, BLOCK_COLS)
    syms, ok = pl.pallas_call(
        kernel,
        grid=(ncells, nseg),
        in_specs=[
            pl.BlockSpec((None, None, nsub, 1), lambda m, g: (m, g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, nsub, BLOCK_ROWS, BLOCK_COLS),
                         lambda m, g: (m, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nsub, BLOCK_ROWS, BLOCK_COLS),
                         lambda m, g: (m, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sym_tab.shape[0], 128), lambda m, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fc.shape[0], 128), lambda m, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nsub, None, wrows, BLOCK_COLS),
                         lambda m, g: (m, 0, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, nsub, None, kseg // 4, BLOCK_ROWS, BLOCK_COLS),
                lambda m, g: (m, 0, g, 0, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((None, nsub, BLOCK_ROWS, BLOCK_COLS),
                         lambda m, g: (m, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (ncells, nsub, nseg, kseg // 4, BLOCK_ROWS, BLOCK_COLS),
                jnp.uint32,
            ),
            jax.ShapeDtypeStruct(
                (ncells, nsub, BLOCK_ROWS, BLOCK_COLS), jnp.int32
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((nsub, BLOCK_ROWS, BLOCK_COLS), jnp.uint32),
            pltpu.SMEM((nsub, 1), jnp.int32),
            pltpu.VMEM((nsub, BLOCK_ROWS, BLOCK_COLS), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(counts4, states4, lens4, sym_tab, fc, words5)
    # unpack 4 symbols per u32: byte b of packed word w is symbol j = 4w + b.
    # Unpacked as u8 (symbols are bytes): the stacked intermediate is then
    # 1/4 the HBM traffic of an i32 unpack on big batches.
    packed = syms.reshape(nb_pad, k // 4, BLOCK_ROWS, BLOCK_COLS)[:nblocks]
    parts = [((packed >> (8 * b)) & 0xFF).astype(jnp.uint8) for b in range(4)]
    un = jnp.stack(parts, axis=2).reshape(nblocks, k, BLOCK_ROWS, BLOCK_COLS)
    return un, ok.reshape(nb_pad, BLOCK_ROWS, BLOCK_COLS)[:nblocks]
