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
import jax.numpy as jnp

from fpv_tpu.ops import rans_pallas as rp


def _build_args(nblocks: int, seed: int = 0, ctx: bool = False):
    """Encode a synthetic high plane through the production codec path.

    Content mimics post-CG high-plane residuals (plasma-like: small
    mostly-positive values with a heavy zero mode) so the replicas time a
    realistic renorm density.  With ``ctx`` the plane is nibble-coded
    through the CTX16 path (the production low-plane coding).  Returns
    production decode_pallas (args, kwargs) plus the symbol count.
    """
    from fpv_tpu.entropy import plane_codec as pc

    rng = np.random.default_rng(seed)
    n = nblocks * pc.DEFAULT_CHUNK_LEN * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    plane = plane.reshape(1, -1)
    hist = np.bincount(plane.reshape(-1), minlength=256)
    stream = pc.encode_plane_batch(
        plane, hist, engine="pallas",
        coding=pc.CODING_CTX16 if ctx else pc.CODING_ORDER0,
    )
    args, kwargs = pc.pallas_decode_args(stream)
    args = tuple(jax.block_until_ready(a) for a in args)
    return args, kwargs, n


def _time_decode(args, kwargs, *, reps: int = 5, **kw) -> float:
    """Best-of-N wall time of one decode_pallas call (seconds)."""
    return _time_interleaved([(args, kwargs, kw)], reps=reps)[0]


def _time_interleaved(variants, *, reps: int = 5, fn=None) -> list[float]:
    """Best-of-N wall times, measured ROUND-ROBIN across the variants.

    The attached device's step time drifts by >+-5% over tens of seconds
    (thermal / tunnel neighbors); sequential per-variant timing folds that
    drift into the comparison (observed: a strictly-less-work stub
    measuring SLOWER than the full kernel).  Interleaving puts every
    variant under the same drift.
    """
    fn = fn or rp.decode_pallas
    if not variants:
        # every candidate failed to compile (the nsub reports record those
        # as per-variant error strings instead of raising)
        return []

    def run(v):
        args, kwargs, kw = v
        out = fn(*args, **kwargs, **kw)
        jax.block_until_ready(out)
        return out

    for v in variants:
        out = run(v)  # compile
    # Tunnel artifact guard: under the dev harness's tunneled device,
    # block_until_ready is a NO-OP until the process has performed at
    # least one device->host fetch (measured: 0.1 ms "timings" of a 40 ms
    # kernel when nothing was ever fetched; real times from the very next
    # call after a 4-byte fetch).  Fetch one tiny slice once, after
    # warmup, so every timed block_until_ready below is real.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
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
    iteration decoding NSUB_DEC x 8 x 128 symbols in one grid cell; cells in
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
        "grid_cells": kwargs["nblocks"] // rp.NSUB_DEC,
        "step_full_ns": 1e9 * t_full / nsteps,
        "step_chain_ns": 1e9 * t_chain / nsteps,
        "step_core_ns": 1e9 * t_core / nsteps,
        "decode_bound_fraction": t_chain / t_full,
        "core_fraction": t_core / t_full,
        "full_msym_s": syms_total / 1e6 / t_full,
        "chain_ceiling_msym_s": syms_total / 1e6 / t_chain,
    }


def _build_encode_args(nblocks: int, seed: int = 0):
    """Production-shaped order-0 ENCODE launch args for the same synthetic
    plane as _build_args.  Returns (args, kwargs, nsyms)."""
    import jax.numpy as jnp

    from fpv_tpu.entropy import plane_codec as pc
    from fpv_tpu.entropy.tables import normalize_freqs

    rng = np.random.default_rng(seed)
    k = pc.DEFAULT_CHUNK_LEN
    n = nblocks * k * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    plane = plane.reshape(1, -1)
    hist = np.bincount(plane.reshape(-1), minlength=256)
    freq = normalize_freqs(hist, ensure_all=True, floor_mask=hist > 0)
    fc, _finv, _sym = rp.table_arrays(freq)
    lens = pc.chunk_lens(1, n, k)
    nb = len(lens) // 1024
    syms = pc._to_block_symbols(jnp.asarray(plane), k, nb)
    lens_dev = jnp.asarray(lens.reshape(nb, 8, 128))
    args = tuple(
        jax.block_until_ready(a) for a in (syms, lens_dev, jnp.asarray(fc))
    )
    return args, dict(chunk_len=k, nblocks=nb), n


def nsub_encode_report(nblocks: int = 64, reps: int = 7) -> dict:
    """Encode-side twin of nsub_report (see its docstring)."""
    args, kwargs, syms_total = _build_encode_args(nblocks)
    variants, labels = [], []
    for ns in (1, 2, 4, 8):
        try:
            out = rp.encode_pallas(*args, **kwargs, nsub=ns)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 — record, don't crash
            labels.append((ns, str(e).splitlines()[0][:120]))
            continue
        variants.append((args, kwargs, {"nsub": ns}))
        labels.append((ns, None))
    times = _time_interleaved(variants, reps=reps, fn=rp.encode_pallas)
    res: dict = {"nblocks": kwargs["nblocks"], "chunk_len": kwargs["chunk_len"]}
    ti = iter(times)
    for ns, err in labels:
        res[f"nsub{ns}_msym_s"] = (
            None if err is not None else syms_total / 1e6 / next(ti)
        )
        if err is not None:
            res[f"nsub{ns}_error"] = err
    return res


def nsub_report(nblocks: int = 64, reps: int = 7, ctx: bool = False) -> dict:
    """A/B the decode kernel's per-cell ILP factor (``nsub`` independent
    dependency chains per grid cell) on the production launch config.

    The round-3 NSUB sweep predates the fused single-gather tables, which
    changed the step's latency structure; this keeps the question measured.
    Variants are timed round-robin interleaved (same drift discipline as
    bound_report).  nsub=4 may exceed VMEM at production chunk_len — a
    compile failure is recorded as ``null`` rather than raised.
    """
    args, kwargs, syms_total = _build_args(nblocks, ctx=ctx)
    variants, labels = [], []
    for ns in (1, 2, 4, 8):
        try:
            out, _ = rp.decode_pallas(*args, **kwargs, nsub=ns)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 — record, don't crash
            labels.append((ns, str(e).splitlines()[0][:120]))
            continue
        variants.append((args, kwargs, {"nsub": ns}))
        labels.append((ns, None))
    times = _time_interleaved(variants, reps=reps)
    res: dict = {"nblocks": kwargs["nblocks"], "chunk_len": kwargs["chunk_len"]}
    ti = iter(times)
    for ns, err in labels:
        res[f"nsub{ns}_msym_s"] = (
            None if err is not None else syms_total / 1e6 / next(ti)
        )
        if err is not None:
            res[f"nsub{ns}_error"] = err
    return res


def fused_rows_report(nblocks: int = 64, reps: int = 7) -> dict:
    """POST-fusion fused-table row sweep: prob_bits 12 / 11 / 10.

    The round-3 prob_bits elimination predates the fused single-gather
    tables: it shrank only the SYMBOL table of the two-table kernel while
    the dependent slot->sym->fc pair still set the chain, so "row gathers
    are free" was measured for that layout and extrapolated to this one.
    The fused kernel's per-step table cost is a scale/128-row gather +
    OR-merge tree (32 rows at the format's prob_bits=12); this sweep
    re-asks the question where it now lives: does halving/quartering the
    fused rows (prob_bits 11 -> 16 rows, 10 -> 8 rows) buy step time, and
    what would the coarser quantization cost in stream size?

    Streams are really encoded at each prob_bits (encode_pallas is
    parametric; the wire format pins 12, so a win here would motivate a
    format rev, not ship silently).  Decodes are verified exact, timed
    round-robin interleaved.  Reports Msym/s and measured bits/byte per
    variant.
    """
    import jax.numpy as jnp

    from fpv_tpu.entropy import plane_codec as pc
    from fpv_tpu.entropy.tables import normalize_freqs

    rng = np.random.default_rng(0)
    k = pc.DEFAULT_CHUNK_LEN
    n = nblocks * k * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    hist = np.bincount(plane, minlength=256)
    lens = pc.chunk_lens(1, n, k)
    nb = len(lens) // 1024
    syms = pc._to_block_symbols(jnp.asarray(plane.reshape(1, -1)), k, nb)
    lens_dev = jnp.asarray(lens.reshape(nb, 8, 128))
    syms_np = np.asarray(syms)

    variants, meta = [], []
    for pb in (12, 11, 10):
        scale = 1 << pb
        freq = normalize_freqs(
            hist, scale=scale, ensure_all=True, floor_mask=hist > 0
        )
        cum = np.zeros(256, np.uint32)
        cum[1:] = np.cumsum(freq)[:-1].astype(np.uint32)
        fc = (
            ((np.maximum(freq, 1) - 1).astype(np.uint32) & (scale - 1))
            | (cum << np.uint32(pb))
        ).reshape(2, 128)
        states, words, counts = rp.encode_pallas(
            syms, lens_dev, jnp.asarray(fc), chunk_len=k, nblocks=nb,
            prob_bits=pb,
        )
        ftab = rp.fused_table_arrays(freq, prob_bits=pb)
        # compact the encode staging buffer to the production rows_alloc
        # window (pallas_decode_args does the same): passing the full
        # worst-case wrows=4144 staging rows would both trip the decode
        # VMEM guard (nsub drop) and mistime the shipping window geometry
        counts_np = np.asarray(counts).reshape(-1)
        rows_q = pc._quantize_rows(int(counts_np.max()), k)
        cap = pc._quantize_cap(int(counts_np.sum()), k, nb)
        cum = np.zeros(len(counts_np) + 1, np.int32)
        cum[1:] = np.cumsum(counts_np)
        payload = pc._compact_payload(
            words.reshape(len(counts_np), -1, 128), jnp.asarray(cum), cap,
            rows_q,
        )
        payload = jnp.concatenate(
            [payload, jnp.zeros((rows_q + 16) * 128, jnp.uint16)]
        )
        words_c = pc._expand_payload(
            payload, jnp.asarray(cum),
            jnp.asarray(counts_np.astype(np.int32)), rows_q + 16,
        )
        args = (
            jax.block_until_ready(jnp.asarray(counts_np.reshape(-1, 1, 1))),
            states, lens_dev,
            jnp.asarray(ftab), jnp.asarray(fc),
            words_c,
        )
        kwargs = dict(chunk_len=k, nblocks=nb, prob_bits=pb, fused_tab=True)
        out, ok = rp.decode_pallas(*args, **kwargs)
        if not bool(np.asarray(ok).all()):
            raise AssertionError(f"prob_bits={pb} decode integrity failed")
        if not (np.asarray(out)[: nb] == syms_np).all():
            raise AssertionError(f"prob_bits={pb} decode mismatch")
        nbytes = int(np.asarray(counts).sum()) * 2 + 4 * nb * 1024
        variants.append((args, kwargs, {}))
        meta.append((pb, ftab.shape[0], nbytes))
    times = _time_interleaved(variants, reps=reps)
    res: dict = {"nblocks": nb, "chunk_len": k, "syms": n}
    for (pb, rows, nbytes), t in zip(meta, times):
        res[f"pb{pb}_rows"] = rows
        res[f"pb{pb}_msym_s"] = n / 1e6 / t
        res[f"pb{pb}_bits_per_byte"] = 8.0 * nbytes / n
    return res


def class_tables_report(nblocks: int = 32, reps: int = 7) -> dict:
    """Measured decode cost of per-temporal-class frequency tables.

    examples/class_tables_study.py found class-splitting the shared table
    saves 0.7-3.8% of stream size; the open question was the decode cost:
    the interleaved lane layout mixes all temporal classes inside every
    step, so a real implementation pays a (nclasses x rows)-row gather
    tree with a per-lane class offset.  The ``stub_class`` kernel models
    exactly that — N identical tiled copies of the fused table plus the
    per-lane offset arithmetic — so the output stays bit-exact while the
    tree is the real per-class size.  Reports step-time ratios for 2 and 3
    classes vs the shipping single table, order-0 AND ctx16 paths,
    round-robin interleaved.
    """
    res: dict = {"nblocks": nblocks}
    for ctx in (False, True):
        args, kwargs, n = _build_args(nblocks, ctx=ctx)
        symtab = np.asarray(args[3])
        variants = [(args, kwargs, {})]
        for ncls in (2, 3):
            tiled = jnp.asarray(np.tile(symtab, (ncls, 1)))
            a2 = args[:3] + (tiled,) + args[4:]
            variants.append((a2, kwargs, {"stub_class": ncls}))
        outs = [
            np.asarray(rans_outputs[0])
            for rans_outputs in (
                rp.decode_pallas(*v[0], **v[1], **v[2]) for v in variants
            )
        ]
        for o in outs[1:]:
            if not np.array_equal(o, outs[0]):
                raise AssertionError("stub_class output diverged")
        times = _time_interleaved(variants, reps=reps)
        key = "ctx" if ctx else "order0"
        res[f"{key}_msym_s"] = n / 1e6 / times[0]
        res[f"{key}_cls2_ratio"] = times[1] / times[0]
        res[f"{key}_cls3_ratio"] = times[2] / times[0]
    return res


if __name__ == "__main__":
    import json
    import sys

    if "nsub_encode" in sys.argv[1:]:
        rep = nsub_encode_report()
    elif "nsub" in sys.argv[1:]:
        rep = nsub_report()
    elif "fused_rows" in sys.argv[1:]:
        rep = fused_rows_report()
    elif "class_tables" in sys.argv[1:]:
        rep = class_tables_report()
    else:
        rep = bound_report()
    print(json.dumps(rep, indent=2))
