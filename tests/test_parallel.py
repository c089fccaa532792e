"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from fpv_tpu.parallel import mesh as pmesh


def test_device_count():
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"


@pytest.mark.parametrize("n", [2, 4, 8])
def test_multichip_dryrun(n):
    pmesh.multichip_dryrun(n)


def test_sharded_model_step_matches_single_device():
    from fpv_tpu.api.fpvt_codec import encode_model_step
    from fpv_tpu.utils import testdata

    frames = testdata.plasma_frames(8, 32, 32, bits=12)
    delta = frames[0]
    dh = np.asarray(((delta.astype(np.uint16) << 4) >> 8)).astype(np.uint8)
    dl = np.asarray((delta.astype(np.uint16) << 4) & 0xFF).astype(np.uint8)

    m = pmesh.make_mesh(4, data=4, space=1)
    step = pmesh.sharded_encode_model_step(m, shift=4)
    out_sharded = step(pmesh.shard_frames(frames, m), dh, dl)
    out_single = encode_model_step(
        jax.numpy.asarray(frames), jax.numpy.asarray(dh), jax.numpy.asarray(dl),
        4, False,
    )
    for k in ("high", "low", "preview", "hist_high"):
        np.testing.assert_array_equal(np.asarray(out_sharded[k]),
                                      np.asarray(out_single[k]))
    np.testing.assert_array_equal(np.asarray(out_sharded["use_delta"]),
                                  np.asarray(out_single["use_delta"]))


def test_graft_entry():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert "high" in out and out["high"].shape == args[0].shape
    ge.dryrun_multichip(4)
