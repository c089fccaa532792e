"""rANS engines: tables, numpy/pallas bit-equivalence."""

import numpy as np
import pytest

from fpv_tpu.entropy.plane_codec import (
    decode_plane_batch,
    encode_plane_batch,
)
from fpv_tpu.entropy.tables import PROB_SCALE, normalize_freqs
from fpv_tpu.ops import rans_numpy as rn
from fpv_tpu.ops.rans_layout import BLOCK_LANES, chunk_lens
from fpv_tpu.utils import testdata


def test_normalize_freqs_properties():
    rng = np.random.default_rng(11)
    for _ in range(20):
        hist = rng.integers(0, 10000, size=256)
        hist[rng.integers(0, 256, size=100)] = 0
        if hist.sum() == 0:
            hist[0] = 1
        freq = normalize_freqs(hist)
        assert freq.sum() == PROB_SCALE
        assert np.all((freq > 0) == (hist > 0))


def test_normalize_freqs_floor_mask():
    """floor_mask floors only masked symbols; absent ones get freq 0."""
    rng = np.random.default_rng(12)
    hist = np.zeros(256, np.int64)
    hist[10:20] = rng.integers(1, 1000, size=10)
    mask = np.zeros(256, bool)
    mask[8:24] = True  # support superset
    freq = normalize_freqs(hist, ensure_all=True, floor_mask=mask)
    assert freq.sum() == PROB_SCALE
    assert np.all(freq[~mask] == 0)
    assert np.all(freq[mask] >= 1)
    # reclaimed floor mass: masked table must beat the blanket floor on
    # the coded cost of the histogrammed symbols
    freq_all = normalize_freqs(hist, ensure_all=True)
    p = hist / hist.sum()
    cost = lambda f: -(p[hist > 0] * np.log2(f[hist > 0] / PROB_SCALE)).sum()
    assert cost(freq) < cost(freq_all)


def test_support_mask_device_superset():
    """_support_mask is always a superset of the true support, and tight
    for mod-256 residual clusters (which straddle 0/255)."""
    import jax.numpy as jnp

    from fpv_tpu.api.fpvt_codec import _support_mask

    rng = np.random.default_rng(13)
    cases = [
        (rng.laplace(0, 3, size=(2, 64, 64)).astype(np.int64) % 256),  # wrap
        rng.integers(100, 140, size=(2, 64, 64)),  # plain interval
        rng.integers(0, 256, size=(2, 64, 64)),  # full range
        np.full((1, 8, 8), 7),  # constant
    ]
    for vals in cases:
        plane = jnp.asarray(vals.astype(np.uint8))
        mask = np.asarray(_support_mask(plane)).astype(bool)
        support = np.bincount(vals.astype(np.uint8).reshape(-1),
                              minlength=256) > 0
        assert np.all(mask[support]), "mask must cover every present symbol"
    # tightness on the wraparound cluster: no more than the contiguous run
    vals = (rng.laplace(0, 3, size=(4, 64, 64)).astype(np.int64) % 256)
    plane = jnp.asarray(vals.astype(np.uint8))
    mask = np.asarray(_support_mask(plane)).astype(bool)
    assert mask.sum() < 80  # cluster spans far less than 256


def test_normalize_freqs_device_masked():
    """Device normalizer: valid masked tables; legacy path unchanged."""
    import jax.numpy as jnp

    from fpv_tpu.entropy.tables_device import normalize_freqs_device

    rng = np.random.default_rng(15)
    hist = np.zeros(256, np.int64)
    hist[30:45] = rng.integers(1, 5000, size=15)
    mask = np.zeros(256, np.int32)
    mask[28:50] = 1
    freq = np.asarray(
        normalize_freqs_device(jnp.asarray(hist), jnp.asarray(mask))
    )
    assert freq.sum() == PROB_SCALE
    assert np.all(freq[mask == 0] == 0)
    assert np.all(freq[mask == 1] >= 1)
    # no-mask call still sums exactly and floors everything
    freq_all = np.asarray(normalize_freqs_device(jnp.asarray(hist)))
    assert freq_all.sum() == PROB_SCALE
    assert np.all(freq_all >= 1)


def test_nsub_launch_geometry_bit_exact():
    """nsub (per-cell ILP factor) is pure launch geometry: encode output
    streams and decode symbol output are bit-identical across nsub=1/2/4,
    including the non-multiple padding path (nblocks=3)."""
    import jax.numpy as jnp

    from fpv_tpu.entropy import plane_codec as pc
    from fpv_tpu.entropy.tables import normalize_freqs
    from fpv_tpu.ops import rans_pallas as rp

    rng = np.random.default_rng(9)
    k, nb = 32, 3
    n = nb * k * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    plane = plane.reshape(1, -1)
    hist = np.bincount(plane.reshape(-1), minlength=256)
    freq = normalize_freqs(hist, ensure_all=True, floor_mask=hist > 0)
    fc, _finv, _sym = rp.table_arrays(freq)
    lens = pc.chunk_lens(1, n, k)
    syms = pc._to_block_symbols(jnp.asarray(plane), k, nb)
    lens_dev = jnp.asarray(lens.reshape(nb, 8, 128))
    enc = {}
    for ns in (1, 2, 4):
        out = rp.encode_pallas(
            syms, lens_dev, jnp.asarray(fc), chunk_len=k, nblocks=nb, nsub=ns
        )
        enc[ns] = tuple(np.asarray(o) for o in out)
    for a, b in ((1, 2), (2, 4)):
        for x, y in zip(enc[a], enc[b]):
            assert np.array_equal(x, y)

    stream = pc.encode_plane_batch(plane, hist, engine="numpy", chunk_len=k)
    args, kwargs = pc.pallas_decode_args(stream)
    dec = {}
    for ns in (1, 2, 4):
        s2, ok = rp.decode_pallas(*args, **kwargs, nsub=ns)
        assert np.all(np.asarray(ok) == 1)
        dec[ns] = np.asarray(s2)
    assert np.array_equal(dec[1], dec[2]) and np.array_equal(dec[2], dec[4])


def test_decode_nsub_vmem_guard():
    """Dense payload windows clamp nsub instead of OOMing scoped VMEM.

    The decode words window is nsub * wrows rows of u32[128] per grid
    cell, and wrows tracks the stream's real payload density
    (plane_codec rows_alloc).  Near-incompressible streams — FPV_TPU_RAW=0,
    or pre-v6 files that stored coded noise planes — reach the
    worst-case wrows ~ 4144, where nsub=4 exceeded the 16 MB scoped-vmem
    limit on v5e (measured compile OOM, round 5).  decode_pallas now
    halves nsub until nsub*wrows fits; the clamped launch must stay
    bit-exact (nsub is pure launch geometry)."""
    import jax.numpy as jnp

    from fpv_tpu.entropy import plane_codec as pc
    from fpv_tpu.ops import rans_pallas as rp

    # decision table: raw-policy production streams (<= ~8.2 bits/sym,
    # ~2100 rows) keep 4; the worst-case window drops to 2; beyond-budget
    # windows clamp to 1
    assert rp.decode_nsub(4, 2100) == 4
    assert rp.decode_nsub(4, 4144) == 2
    assert rp.decode_nsub(4, 12289) == 1
    assert rp.decode_nsub(2, 4144) == 2
    assert rp.decode_nsub(1, 99999) == 1

    # end-to-end: an over-wide window (wrows past the nsub=4 budget) must
    # decode bit-identically through the clamped launch
    rng = np.random.default_rng(10)
    k, nb = 32, 2
    n = nb * k * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    plane = plane.reshape(1, -1)
    hist = np.bincount(plane.reshape(-1), minlength=256)
    stream = pc.encode_plane_batch(plane, hist, engine="numpy", chunk_len=k)
    args, kwargs = pc.pallas_decode_args(stream)
    ref, ok_ref = rp.decode_pallas(*args, **kwargs)
    assert np.all(np.asarray(ok_ref) == 1)
    words = args[5]
    wide = jnp.zeros((words.shape[0], 3200, words.shape[2]), words.dtype)
    wide = wide.at[:, : words.shape[1]].set(words)
    assert rp.decode_nsub(rp.NSUB_DEC, 3200) == 2  # the launch this takes
    syms, ok = rp.decode_pallas(*args[:5], wide, **kwargs)
    assert np.all(np.asarray(ok) == 1)
    assert np.array_equal(np.asarray(syms), np.asarray(ref))


def test_stub_class_tables_bit_exact():
    """The per-class-tables latency model (stub_class) decodes
    bit-identically: N tiled identical table copies + per-lane class
    offsets reach the same entries, so only the gather-tree size differs
    (that's the point — it isolates the decode cost of class-splitting,
    ops/rans_bound.class_tables_report)."""
    import jax.numpy as jnp

    from fpv_tpu.entropy import plane_codec as pc
    from fpv_tpu.ops import rans_pallas as rp

    rng = np.random.default_rng(13)
    k, nb = 32, 2
    n = nb * k * 1024
    vals = rng.geometric(0.35, n).astype(np.int64) - 1
    plane = ((-(vals & 1) ^ (vals >> 1)) & 0xFF).astype(np.uint8)
    plane = plane.reshape(1, -1)
    hist = np.bincount(plane.reshape(-1), minlength=256)
    for coding in (pc.CODING_ORDER0, pc.CODING_CTX16):
        if coding == pc.CODING_CTX16:
            plane_c = (plane & 0xF0).astype(np.uint8)  # low nibble clear
            hist_c = np.bincount(plane_c.reshape(-1), minlength=256)
        else:
            plane_c, hist_c = plane, hist
        stream = pc.encode_plane_batch(
            plane_c, hist_c, engine="numpy", chunk_len=k, coding=coding
        )
        args, kwargs = pc.pallas_decode_args(stream)
        ref, ok = rp.decode_pallas(*args, **kwargs)
        assert np.all(np.asarray(ok) == 1)
        for ncls in (2, 3):
            tiled = jnp.asarray(np.tile(np.asarray(args[3]), (ncls, 1)))
            syms, ok2 = rp.decode_pallas(
                *args[:3], tiled, *args[4:], **kwargs, stub_class=ncls
            )
            assert np.all(np.asarray(ok2) == 1)
            assert np.array_equal(np.asarray(syms), np.asarray(ref))


def test_fused_decode_tables_device_matches_host():
    """Device fused-table builder (one-hot matmul) == host builder, for
    both dense and narrow-support freq tables."""
    import jax.numpy as jnp

    from fpv_tpu.entropy.tables_device import (
        fused_decode_tables_device,
        normalize_freqs_device,
    )
    from fpv_tpu.ops import rans_pallas as rp

    rng = np.random.default_rng(21)
    hists = [
        rng.integers(0, 1000, size=256),
        np.r_[rng.integers(1, 50, size=16), np.zeros(240, np.int64)],
    ]
    for hist in hists:
        freq = np.asarray(normalize_freqs_device(jnp.asarray(hist)))
        dev = np.asarray(fused_decode_tables_device(jnp.asarray(freq)))
        host = rp.fused_table_arrays(freq)
        assert dev.dtype == host.dtype and dev.shape == host.shape
        assert np.array_equal(dev, host)


def test_masked_tables_roundtrip_both_engines():
    """Narrow-support plane + exact mask: encode/decode on both engines."""
    rng = np.random.default_rng(14)
    vals = (rng.laplace(0, 2, size=(3, 48, 128)).astype(np.int64) % 256)
    planes = vals.astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256)
    # sampled-looking hist (drop some counts) + exact mask
    hist_s = hist.copy()
    hist_s[hist_s == 1] = 0
    mask = hist > 0
    for engine in ("numpy", "pallas"):
        b = planes.shape[0]
        stream = encode_plane_batch(
            planes.reshape(b, -1), hist_s, chunk_len=64, engine=engine,
            mask=mask,
        )
        assert np.all(stream.freq[~mask] == 0)
        out = np.asarray(decode_plane_batch(stream, engine=engine))
        np.testing.assert_array_equal(out, planes.reshape(b, -1))


def _roundtrip(planes: np.ndarray, chunk_len=128, engine="numpy"):
    b = planes.shape[0]
    hist = np.bincount(planes.reshape(-1), minlength=256)
    stream = encode_plane_batch(
        planes.reshape(b, -1), hist, chunk_len=chunk_len, engine=engine
    )
    out = np.asarray(decode_plane_batch(stream, engine=engine))
    np.testing.assert_array_equal(out, planes.reshape(b, -1))
    return stream


@pytest.mark.parametrize(
    "gen",
    [
        lambda: (testdata.plasma_frames(4, 48, 64) >> 8).astype(np.uint8),
        lambda: (testdata.noise_frames(3, 32, 48) & 0xFF).astype(np.uint8),
        lambda: np.full((2, 40, 40), 7, dtype=np.uint8),
        lambda: (testdata.plasma_frames(2, 31, 37) >> 8).astype(np.uint8),
    ],
)
def test_numpy_engine_roundtrip(gen):
    _roundtrip(gen())


def test_rans_ratio_reasonable_vs_entropy():
    """Coded size should be within a few % of the order-0 entropy bound.

    Uses a plane large enough to amortize the per-block lane states (the
    1024-way interleave costs 4 KB of states per 512K-symbol block; tiny
    planes pay proportionally more — a documented tradeoff for the
    transpose-free device layout).
    """
    planes = (testdata.plasma_frames(16, 256, 256) >> 8).astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256).astype(np.float64)
    p = hist[hist > 0] / hist.sum()
    h_bits = -(p * np.log2(p)).sum() * planes.size
    stream = encode_plane_batch(
        planes.reshape(16, -1), hist.astype(np.int64), chunk_len=512,
        engine="numpy",
    )
    coded_bits = stream.payload.size * 16 + stream.num_chunks * 32
    assert coded_bits < h_bits * 1.08 + 64 * 8


def test_corrupt_stream_detected():
    planes = (testdata.plasma_frames(2, 32, 32) >> 8).astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256)
    stream = encode_plane_batch(planes.reshape(2, -1), hist, chunk_len=128,
                                engine="numpy")
    assert stream.payload.size
    stream.payload[0] ^= 0x5A
    with pytest.raises(ValueError):
        decode_plane_batch(stream, engine="numpy")


def _pallas_available():
    # interpret mode works on CPU; compiled mode needs a TPU
    return True


def test_pallas_kernels_match_numpy_engine():
    """Bit-exact equivalence of the Pallas kernels (interpret mode) vs the
    numpy engine: states, block counts, payload, decode output."""
    import jax.numpy as jnp

    from fpv_tpu.ops import rans_pallas as rp

    rng = np.random.default_rng(0)
    B, S, K = 3, 700, 64
    data = rng.normal(100, 25, size=(B, S)).astype(np.uint8)
    lens = chunk_lens(B, S, K)
    c_pad = len(lens)
    nblocks = c_pad // BLOCK_LANES
    from fpv_tpu.entropy.plane_codec import _interleave_np

    symbols = _interleave_np(data, K, nblocks)
    freq = normalize_freqs(np.bincount(data.reshape(-1), minlength=256))

    states, counts, payload = rn.encode_blocks(symbols, lens, freq)

    fc, finv, symtab = rp.table_arrays(freq)
    syms_dev = jnp.asarray(
        symbols.reshape(nblocks, BLOCK_LANES, K)
        .transpose(0, 2, 1)
        .reshape(nblocks, K, 8, 128)
        .astype(np.int32)
    )
    lens_dev = jnp.asarray(lens.reshape(nblocks, 8, 128))
    st, words, cnts = rp.encode_pallas(
        syms_dev, lens_dev, jnp.asarray(fc),
        K, nblocks, interpret=True,
    )
    cn = np.asarray(cnts).reshape(-1)
    np.testing.assert_array_equal(cn, counts.astype(cn.dtype))
    np.testing.assert_array_equal(np.asarray(st).reshape(-1), states)
    w_np = np.asarray(words).reshape(nblocks, -1)
    pl_payload = np.concatenate(
        [w_np[m, : cn[m]] for m in range(nblocks)]
    ).astype(np.uint16)
    np.testing.assert_array_equal(pl_payload, payload)

    wrows = rp.words_rows(K)
    words_padded = np.zeros((nblocks, wrows * 128), np.uint32)
    off = 0
    for m in range(nblocks):
        words_padded[m, : cn[m]] = payload[off : off + cn[m]]
        off += cn[m]
    out, ok = rp.decode_pallas(
        jnp.asarray(cn.reshape(nblocks, 1, 1).astype(np.int32)),
        jnp.asarray(states.reshape(nblocks, 8, 128)),
        lens_dev,
        jnp.asarray(symtab),
        jnp.asarray(fc),
        jnp.asarray(words_padded.reshape(nblocks, wrows, 128)),
        K, nblocks, interpret=True,
    )
    assert np.asarray(ok).all()
    out_np = (
        np.asarray(out)
        .reshape(nblocks, K, BLOCK_LANES)
        .transpose(0, 2, 1)
        .reshape(c_pad, K)
        .astype(np.uint8)
    )
    mask = np.arange(K)[None, :] < lens[:, None]
    np.testing.assert_array_equal(out_np[mask], symbols[mask])


def test_fused_table_decode_matches():
    """fused_tab decode (one slot-indexed gather, fused_table_arrays) is
    bit-exact vs the two-table order-0 decode on the same stream."""
    import jax.numpy as jnp

    from fpv_tpu.entropy.plane_codec import _interleave_np
    from fpv_tpu.ops import rans_pallas as rp

    rng = np.random.default_rng(3)
    B, S, K = 2, 900, 64
    data = rng.normal(100, 25, size=(B, S)).astype(np.uint8)
    lens = chunk_lens(B, S, K)
    nblocks = len(lens) // BLOCK_LANES
    symbols = _interleave_np(data, K, nblocks)
    freq = normalize_freqs(np.bincount(data.reshape(-1), minlength=256))
    states, counts, payload = rn.encode_blocks(symbols, lens, freq)

    fused = rp.fused_table_arrays(freq)
    assert fused.shape == (32, 128)
    fc, _finv, _symtab = rp.table_arrays(freq)
    wrows = rp.words_rows(K)
    words_padded = np.zeros((nblocks, wrows * 128), np.uint32)
    off = 0
    for m in range(nblocks):
        words_padded[m, : counts[m]] = payload[off : off + counts[m]]
        off += counts[m]
    out, ok = rp.decode_pallas(
        jnp.asarray(counts.reshape(nblocks, 1, 1).astype(np.int32)),
        jnp.asarray(states.reshape(nblocks, 8, 128)),
        jnp.asarray(lens.reshape(nblocks, 8, 128)),
        jnp.asarray(fused),
        jnp.asarray(fc),
        jnp.asarray(words_padded.reshape(nblocks, wrows, 128)),
        K, nblocks, interpret=True, fused_tab=True,
    )
    assert np.asarray(ok).all()
    out_np = (
        np.asarray(out).reshape(nblocks, K, BLOCK_LANES)
        .transpose(0, 2, 1).reshape(-1, K).astype(np.uint8)
    )
    mask = np.arange(K)[None, :] < lens[:, None]
    np.testing.assert_array_equal(out_np[mask], symbols[mask])


def test_ctx_fused_table_decode_matches():
    """fused_tab ctx decode (ctx_fused_table_arrays) is bit-exact vs the
    nib+fc-pair ctx decode on the same stream."""
    import jax.numpy as jnp

    from fpv_tpu.entropy.plane_codec import _interleave_np
    from fpv_tpu.entropy.tables import normalize_freqs_ctx
    from fpv_tpu.ops import rans_pallas as rp

    frames = testdata.plasma_frames(2, 40, 64, bits=12, seed=9)
    plane = ((frames << 4) & 0xF0).astype(np.uint8).reshape(2, -1)
    K = 32
    lens = chunk_lens(2, plane.shape[1], K)
    nb = len(lens) // BLOCK_LANES
    sym4 = (_interleave_np(plane, K, nb) >> 4).astype(np.uint8)
    idx = rn.encode_ctx_indices(sym4, lens)
    mask = np.arange(K)[None, :] < lens[:, None]
    hist = np.bincount(idx[mask].reshape(-1), minlength=512)
    freq = normalize_freqs_ctx(hist)
    _f32, cum, _sos = rn.ctx_tables(freq)
    states, counts, payload = rn.encode_blocks(
        idx, lens, freq, prob_bits=7, cum=cum
    )
    fused = rp.ctx_fused_table_arrays(freq)
    assert fused.shape == (32, 128)
    fc_dec, _symtab = rp.ctx_decode_table_arrays(freq)
    wrows = rp.words_rows(K)
    words_padded = np.zeros((nb, wrows * 128), np.uint32)
    off = 0
    for m in range(nb):
        words_padded[m, : counts[m]] = payload[off : off + counts[m]]
        off += counts[m]
    out, ok = rp.decode_pallas(
        jnp.asarray(counts.reshape(nb, 1, 1).astype(np.int32)),
        jnp.asarray(states.reshape(nb, 8, 128)),
        jnp.asarray(lens.reshape(nb, 8, 128)),
        jnp.asarray(fused),
        jnp.asarray(fc_dec),
        jnp.asarray(words_padded.reshape(nb, wrows, 128)),
        K, nb, interpret=True, prob_bits=7, ctx_mode=True, fused_tab=True,
    )
    assert np.asarray(ok).all()
    out_np = (
        np.asarray(out).reshape(nb, K, BLOCK_LANES)
        .transpose(0, 2, 1).reshape(-1, K).astype(np.uint8)
    )
    np.testing.assert_array_equal(out_np[mask], sym4[mask])


def test_segmented_chunks_kernel_matches_numpy():
    """chunk_len > SEG_LEN: the segmented Pallas kernels (state carry across
    grid steps) are bit-exact vs the numpy engine, and roundtrip."""
    import jax.numpy as jnp

    from fpv_tpu.entropy.plane_codec import _interleave_np
    from fpv_tpu.ops import rans_pallas as rp
    from fpv_tpu.ops.rans_layout import SEG_LEN, num_segments

    rng = np.random.default_rng(5)
    B, S, K = 2, 600_000, 2 * SEG_LEN
    nseg = num_segments(K)
    assert nseg == 2
    data = rng.normal(100, 25, size=(B, S)).astype(np.uint8)
    lens = chunk_lens(B, S, K)
    c_pad = len(lens)
    nblocks = c_pad // BLOCK_LANES
    symbols = _interleave_np(data, K, nblocks)
    freq = normalize_freqs(np.bincount(data.reshape(-1), minlength=256))

    states, counts, payload = rn.encode_blocks(symbols, lens, freq)
    assert len(counts) == nblocks * nseg

    fc, finv, symtab = rp.table_arrays(freq)
    syms_dev = jnp.asarray(
        symbols.reshape(nblocks, BLOCK_LANES, K)
        .transpose(0, 2, 1)
        .reshape(nblocks, K, 8, 128)
        .astype(np.int32)
    )
    lens_dev = jnp.asarray(lens.reshape(nblocks, 8, 128))
    st, words, cnts = rp.encode_pallas(
        syms_dev, lens_dev, jnp.asarray(fc), K, nblocks, interpret=True,
    )
    cn = np.asarray(cnts).reshape(-1)
    np.testing.assert_array_equal(cn, counts.astype(cn.dtype))
    np.testing.assert_array_equal(np.asarray(st).reshape(-1), states)
    ngroups = nblocks * nseg
    w_np = np.asarray(words).reshape(ngroups, -1)
    pl_payload = np.concatenate(
        [w_np[g, : cn[g]] for g in range(ngroups)]
    ).astype(np.uint16)
    np.testing.assert_array_equal(pl_payload, payload)

    wrows = rp.words_rows(K)
    words_padded = np.zeros((ngroups, wrows * 128), np.uint32)
    off = 0
    for g in range(ngroups):
        words_padded[g, : cn[g]] = payload[off : off + cn[g]]
        off += cn[g]
    out, ok = rp.decode_pallas(
        jnp.asarray(cn.reshape(ngroups, 1, 1).astype(np.int32)),
        jnp.asarray(states.reshape(nblocks, 8, 128)),
        lens_dev,
        jnp.asarray(symtab),
        jnp.asarray(fc),
        jnp.asarray(words_padded.reshape(ngroups, wrows, 128)),
        K, nblocks, interpret=True,
    )
    assert np.asarray(ok).all()
    out_np = (
        np.asarray(out)
        .reshape(nblocks, K, BLOCK_LANES)
        .transpose(0, 2, 1)
        .reshape(c_pad, K)
        .astype(np.uint8)
    )
    mask = np.arange(K)[None, :] < lens[:, None]
    np.testing.assert_array_equal(out_np[mask], symbols[mask])


def test_segmented_chunks_plane_roundtrip_both_engines():
    """Long chunks through the public plane codec, both engines, both
    codings — fewer stored states, same pixels."""
    from fpv_tpu.ops.rans_layout import CODING_CTX16, SEG_LEN

    rng = np.random.default_rng(6)
    B, K = 2, 2 * SEG_LEN
    planes = rng.normal(120, 12, size=(B, 1200, 1024)).astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256)
    for engine in ("numpy", "pallas"):
        stream = encode_plane_batch(
            planes.reshape(B, -1), hist, chunk_len=K, engine=engine
        )
        out = np.asarray(decode_plane_batch(stream, engine=engine))
        np.testing.assert_array_equal(out, planes.reshape(B, -1))
    # ctx coding (nibble data: bottom nibble zero)
    nib = (planes & 0xF0).astype(np.uint8)
    for engine in ("numpy", "pallas"):
        stream = encode_plane_batch(
            nib.reshape(B, -1), None, chunk_len=K, engine=engine,
            coding=CODING_CTX16,
        )
        out = np.asarray(decode_plane_batch(stream, engine=engine))
        np.testing.assert_array_equal(out, nib.reshape(B, -1))


def test_ctx_mode_numpy_roundtrip_and_gain():
    """Context-coded low-plane mode (coding=1): numpy engine roundtrips and
    beats the order-0 entropy on correlated nibble data."""
    from fpv_tpu.entropy.plane_codec import _interleave_np
    from fpv_tpu.entropy.tables import normalize_freqs_ctx

    frames = testdata.plasma_frames(3, 48, 100, bits=12, seed=2)
    plane = ((frames << 4) & 0xF0).astype(np.uint8).reshape(3, -1)
    K = 64
    lens = chunk_lens(3, plane.shape[1], K)
    nb = len(lens) // BLOCK_LANES
    sym4 = (_interleave_np(plane, K, nb) >> 4).astype(np.uint8)
    idx = rn.encode_ctx_indices(sym4, lens)
    mask = np.arange(K)[None, :] < lens[:, None]
    hist = np.bincount(idx[mask].reshape(-1), minlength=512)
    freq = normalize_freqs_ctx(hist)
    _f32, cum, _sos = rn.ctx_tables(freq)
    states, counts, payload = rn.encode_blocks(
        idx, lens, freq, prob_bits=7, cum=cum
    )
    out, ok = rn.decode_blocks_ctx(states, counts, payload, lens, freq, K)
    assert ok.all()
    np.testing.assert_array_equal(out[mask], sym4[mask])


def test_ctx_mode_pallas_matches_numpy():
    """Pallas ctx-mode kernels (interpret) are bit-exact vs the numpy ctx
    engine: states, counts, payload, and decoded symbols."""
    import jax.numpy as jnp

    from fpv_tpu.entropy.plane_codec import _interleave_np
    from fpv_tpu.entropy.tables import normalize_freqs_ctx
    from fpv_tpu.ops import rans_pallas as rp

    frames = testdata.plasma_frames(2, 40, 64, bits=12, seed=4)
    plane = ((frames << 4) & 0xF0).astype(np.uint8).reshape(2, -1)
    K = 32
    lens = chunk_lens(2, plane.shape[1], K)
    nb = len(lens) // BLOCK_LANES
    sym4 = (_interleave_np(plane, K, nb) >> 4).astype(np.uint8)
    idx = rn.encode_ctx_indices(sym4, lens)
    mask = np.arange(K)[None, :] < lens[:, None]
    hist = np.bincount(idx[mask].reshape(-1), minlength=512)
    freq = normalize_freqs_ctx(hist)
    _f32, cum, _sos = rn.ctx_tables(freq)
    states, counts, payload = rn.encode_blocks(
        idx, lens, freq, prob_bits=7, cum=cum
    )

    fc, _symtab_enc = rp.ctx_table_arrays(freq)
    fc_dec, symtab = rp.ctx_decode_table_arrays(freq)
    syms_dev = jnp.asarray(
        idx.reshape(nb, BLOCK_LANES, K).transpose(0, 2, 1)
        .reshape(nb, K, 8, 128).astype(np.int32)
    )
    lens_dev = jnp.asarray(lens.reshape(nb, 8, 128))
    st, words, cnts = rp.encode_pallas(
        syms_dev, lens_dev, jnp.asarray(fc), K, nb,
        interpret=True, prob_bits=7,
    )
    cn = np.asarray(cnts).reshape(-1)
    np.testing.assert_array_equal(cn, counts.astype(cn.dtype))
    np.testing.assert_array_equal(np.asarray(st).reshape(-1), states)
    w_np = np.asarray(words).reshape(nb, -1)
    pl_payload = np.concatenate(
        [w_np[m, : cn[m]] for m in range(nb)]
    ).astype(np.uint16)
    np.testing.assert_array_equal(pl_payload, payload)

    wrows = rp.words_rows(K)
    words_padded = np.zeros((nb, wrows * 128), np.uint32)
    off = 0
    for m in range(nb):
        words_padded[m, : cn[m]] = payload[off : off + cn[m]]
        off += cn[m]
    out, ok = rp.decode_pallas(
        jnp.asarray(cn.reshape(nb, 1, 1).astype(np.int32)),
        jnp.asarray(states.reshape(nb, 8, 128)),
        lens_dev,
        jnp.asarray(symtab),
        jnp.asarray(fc_dec),
        jnp.asarray(words_padded.reshape(nb, wrows, 128)),
        K, nb, interpret=True, prob_bits=7, ctx_mode=True,
    )
    assert np.asarray(ok).all()
    out_np = (
        np.asarray(out).reshape(nb, K, BLOCK_LANES)
        .transpose(0, 2, 1).reshape(-1, K).astype(np.uint8)
    )
    np.testing.assert_array_equal(out_np[mask], sym4[mask])


def test_plane_codec_pallas_interpret_path():
    """encode/decode_plane_batch with engine='pallas' in interpret mode."""
    import os

    # interpret mode is selected inside rans_pallas only via its flag; on CPU
    # the compiled path would fail, so patch through interpret via monkey use
    from fpv_tpu.ops import rans_pallas as rp
    import functools

    orig_enc, orig_dec = rp.encode_pallas, rp.decode_pallas
    rp.encode_pallas = functools.partial(orig_enc.__wrapped__, interpret=True)
    rp.decode_pallas = functools.partial(orig_dec.__wrapped__, interpret=True)
    try:
        planes = (testdata.plasma_frames(2, 16, 40) >> 8).astype(np.uint8)
        hist = np.bincount(planes.reshape(-1), minlength=256)
        stream = encode_plane_batch(planes.reshape(2, -1), hist,
                                    chunk_len=64, engine="pallas")
        # cross-engine: numpy must decode what pallas encoded
        out = decode_plane_batch(stream, engine="numpy")
        np.testing.assert_array_equal(np.asarray(out), planes.reshape(2, -1))
        out2 = decode_plane_batch(stream, engine="pallas")
        np.testing.assert_array_equal(np.asarray(out2), planes.reshape(2, -1))
    finally:
        rp.encode_pallas, rp.decode_pallas = orig_enc, orig_dec
