"""Worker for the AOT-cache test: fused encode+decode in a fresh process.

Prints the decoded-output digest and the fused entry points' dispatch
stats so the parent test can assert (a) process 2 loaded serialized
executables instead of compiling and (b) both processes produced
identical pixels.
"""

import hashlib
import json
import os
import sys


def main() -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    # route everything through the fused pallas path on tiny geometry
    os.environ.setdefault("FPV_TPU_RANS_ENGINE", "pallas")
    os.environ.setdefault("FPV_TPU_NARROW_MAX", "0")
    os.environ.setdefault("FPV_TPU_RAW", "0")
    # the XLA persistent cache would mask what the AOT layer contributes
    os.environ["FPV_TPU_CACHE"] = "0"
    # force the AOT layer on: the platform default keeps it off on CPU
    os.environ["FPV_TPU_AOT"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fpv_tpu.api import fpvt_codec as fc
    from fpv_tpu.utils import testdata

    frames = testdata.plasma_frames(6, 32, 32, seed=21)
    data = fc.encode_file_fpvt(
        frames, shift=4, frames_per_batch=3, chunk_log2=6
    )
    out = fc.decode_file_fpvt(data)
    print("DIGEST", hashlib.blake2b(np.ascontiguousarray(out)).hexdigest())
    print("ENC_STATS", json.dumps(fc.fused_encode_batch.stats))
    print("DEC_STATS", json.dumps(fc.fused_decode_batch.stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
