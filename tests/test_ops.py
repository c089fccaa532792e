"""Device op kernels vs numpy oracles (reference semantics)."""

import numpy as np
import pytest

from fpv_tpu.api import frame as frame_ops
from fpv_tpu.models import heuristics, predictors
from fpv_tpu.ops import planes as jplanes
from fpv_tpu.ops import predict as jpredict
from fpv_tpu.ops import preview as jpreview
from fpv_tpu.utils import testdata


def _batch(n=3, h=24, w=40, bits=16, seed=5):
    return testdata.plasma_frames(n, h, w, bits=bits, seed=seed)


@pytest.mark.parametrize("shift,big_endian", [(0, False), (4, False), (8, False),
                                              (0, True), (4, True), (8, True)])
def test_split_planes_matches_oracle(shift, big_endian):
    imgs = testdata.noise_frames(2, 16, 24)
    high, low, nonzero = jplanes.split_planes(imgs, shift, big_endian)
    for i in range(2):
        ref = frame_ops.split_planes(imgs[i], shift, big_endian)
        np.testing.assert_array_equal(np.asarray(high)[i], ref.high)
        if ref.low is not None:
            np.testing.assert_array_equal(np.asarray(low)[i], ref.low)
            assert bool(np.asarray(nonzero)[i]) == bool(ref.low.any())
        else:
            assert not bool(np.asarray(nonzero)[i])


def test_combine_and_unextract():
    imgs = _batch()
    high, low, _ = jplanes.split_planes(imgs, 0, False)
    back = np.asarray(jplanes.combine_planes(high, low))
    np.testing.assert_array_equal(back, imgs)
    # unextract matches oracle bytes
    out = np.asarray(jplanes.unextract(imgs, 4, True))
    for i in range(imgs.shape[0]):
        expect = frame_ops.unextract_frame(imgs[i], 4, True)
        np.testing.assert_array_equal(out[i].tobytes(), expect.tobytes())


def test_cg_flat_encode_matches_oracle():
    imgs = _batch()
    high = (imgs >> 8).astype(np.uint8)
    res = np.asarray(jpredict.cg_flat_encode(high))
    for i in range(high.shape[0]):
        np.testing.assert_array_equal(res[i], predictors.cg_encode_np(high[i]))


def test_cg_flat_encode_decode_roundtrip_via_oracle():
    high = (testdata.noise_frames(2, 12, 16) >> 8).astype(np.uint8)
    res = np.asarray(jpredict.cg_flat_encode(high))
    for i in range(2):
        np.testing.assert_array_equal(predictors.cg_decode_np(res[i]), high[i])


def test_cg2d_roundtrip():
    high = (testdata.noise_frames(3, 20, 28) >> 8).astype(np.uint8)
    res = np.asarray(jpredict.cg2d_encode(high))
    # residual differs from input (prediction happened)
    assert (res != high).any()
    back = np.asarray(jpredict.cg2d_decode(res))
    np.testing.assert_array_equal(back, high)


def test_cg2d_wavefront_kernel_matches_scan():
    """The TPU pallas wavefront (interpret mode here) must reconstruct
    bit-identically to the XLA scan oracle across shape classes: tiny,
    non-multiple-of-128, multi-lane-tile H, degenerate 1-row/1-col, and
    multi-batch (the kernel packs batch x row-tiles into sublanes)."""
    rng = np.random.default_rng(7)
    for (b, h, w) in [
        (2, 8, 8), (1, 16, 12), (3, 12, 36), (2, 130, 140), (1, 1, 7),
        (1, 7, 1), (3, 12, 260), (2, 256, 128), (5, 33, 20),
    ]:
        plane = rng.integers(0, 256, (b, h, w), np.int64).astype(np.uint8)
        res = np.asarray(jpredict.cg2d_encode(plane))
        ref = np.asarray(jpredict._cg2d_decode_scan(res))
        np.testing.assert_array_equal(ref, plane)
        got = np.asarray(jpredict._cg2d_decode_pallas(res, interpret=True))
        np.testing.assert_array_equal(got, plane, err_msg=str((b, h, w)))


def test_up_roundtrip():
    high = (testdata.noise_frames(3, 20, 28) >> 8).astype(np.uint8)
    res = np.asarray(jpredict.up_encode(high))
    back = np.asarray(jpredict.up_decode(res))
    np.testing.assert_array_equal(back, high)


def test_delta_ops():
    a = (testdata.noise_frames(2, 8, 8) >> 8).astype(np.uint8)
    d = (testdata.noise_frames(2, 8, 8, seed=9) >> 8).astype(np.uint8)
    res = np.asarray(jpredict.delta_encode(a, d))
    np.testing.assert_array_equal(res, (a - d).astype(np.uint8))
    np.testing.assert_array_equal(np.asarray(jpredict.delta_decode(res, d)), a)


def test_preview_matches_oracle():
    imgs = _batch(2, 32, 48)
    high = (imgs >> 8).astype(np.uint8)
    pv = np.asarray(jpreview.generate_preview(high))
    for i in range(2):
        np.testing.assert_array_equal(pv[i], frame_ops.generate_preview(high[i]))


def test_decide_delta_near_constant_plane():
    """EstimateEntropy's integer division can return 0 for near-constant
    planes (e.g. 69,905 equal samples + 1 outlier: 1024*16 // 69906 == 0),
    so decide_delta must be False there — a constancy check would diverge."""
    # stride-15 sampling of a plane this size yields 69,906 samples
    plane = np.zeros((69906, 15), dtype=np.uint8)
    assert not heuristics.decide_delta(plane)
    plane[0, 0] = 200  # one outlier sample: entropy estimate still 0
    assert not heuristics.decide_delta(plane)
    # small planes with an outlier DO enable delta
    small = np.zeros((16, 15), dtype=np.uint8)
    small[0, 0] = 200
    assert heuristics.decide_delta(small)



def test_undefined_shift_configs_rejected():
    """Big-endian shifts above 8 drive every split implementation into a
    negative shift count (C++ UB / numpy OverflowError) — all three entry
    points must reject them up front; LE shift 16 must yield zeros (the
    reference's C++ truncation), not XLA-undefined output."""
    import pytest

    from fpv_tpu.ops import planes as jplanes

    img = np.arange(64, dtype=np.uint16).reshape(1, 8, 8)
    for shift in (9, 12, 16):
        with pytest.raises(ValueError):
            jplanes.split_planes(img, shift, True)
        with pytest.raises(ValueError):
            frame_ops.split_planes(img[0], shift, True)
    with pytest.raises(ValueError):
        jplanes.split_planes(img, 17, False)
    # LE shift=16: explicit zeros (C++ uint16 truncation semantics)
    h, low, nz = jplanes.split_planes(img, 16, False)
    assert not np.asarray(h).any() and not np.asarray(low).any()


def test_profiling_annotate_propagates_exceptions():
    import pytest

    from fpv_tpu.utils.profiling import annotate

    with pytest.raises(KeyError, match="real error"):
        with annotate("stage"):
            raise KeyError("real error")
