"""Worker process for the two-process DCN sharding test.

Spawned by tests/test_distributed.py: joins a 2-process JAX cluster with 4
virtual CPU devices each (8 global), encodes a file over the
process-spanning mesh, and pixel/byte-compares against the single-device
paths.  Prints one ``WORKER-OK sha256=<hex>`` line on success.
"""

import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # conftest-style platform pinning: the environment's interpreter-startup
    # hook imports jax before user code, so set config in-process before
    # any backend initializes
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["FPV_TPU_RANS_ENGINE"] = "pallas"
    os.environ["FPV_TPU_NARROW_MAX"] = "0"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fpv_tpu.parallel import distributed as dist

    dist.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    # Establish the Gloo context NOW, while inter-process skew is minimal
    # (both workers have only done imports + init).  The context is created
    # by the first cross-process collective with a fixed 30 s rendezvous
    # timeout; if that first collective instead happened inside the heavy
    # interpret-mode compiles below, 1-vCPU scheduling skew between the
    # workers could exceed it (observed flake).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("fpv-dcn-worker-start")

    import hashlib

    import numpy as np

    from fpv_tpu.api.fpvt_codec import decode_file_fpvt, encode_file_fpvt
    from fpv_tpu.utils import testdata

    h, w, bpb = 16, 16, 2
    ndev = 4 * nproc
    n = 1 + 2 * ndev * bpb + bpb  # delta frame + 2 spanning groups + tail
    frames = testdata.plasma_frames(n, h, w, bits=12)
    kwargs = dict(shift=4, frames_per_batch=bpb, chunk_log2=4)

    # process-spanning encode == single-device encode, byte for byte
    got = dist.distributed_encode_file(frames, **kwargs)
    want = encode_file_fpvt(frames, **kwargs)
    assert got == want, (
        f"proc {pid}: distributed file differs "
        f"({len(got)} vs {len(want)} bytes)"
    )

    # round-robin multi-process decode is pixel-exact, as is local decode
    out = dist.distributed_decode_file(got)
    expect = (frames.astype(np.uint32) << 4).astype(np.uint16)
    np.testing.assert_array_equal(out, expect)
    np.testing.assert_array_equal(decode_file_fpvt(got), expect)

    print(f"WORKER-OK sha256={hashlib.sha256(got).hexdigest()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
