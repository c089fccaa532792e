"""Many-camera serving: independent streams multiplexed onto accelerators.

MultiStreamEncoder batches each stream's frames and encodes full batches
as single fused device programs (same-geometry streams share compiled
executables); MultiStreamDecoder is its twin with a two-stage
issue/finalize pipeline so downloads overlap uploads/compute.  Both take
``devices=[...]`` to spread streams round-robin across chips.
"""

import numpy as np

from fpv_tpu.api.multistream import MultiStreamDecoder, MultiStreamEncoder
from fpv_tpu.utils import testdata


def main() -> None:
    cams = {f"cam{i}": testdata.plasma_frames(9, 64, 64, seed=i)
            for i in range(3)}

    # ---- encode side: sink receives ordered byte chunks per stream
    files: dict[str, list] = {sid: [] for sid in cams}
    enc = MultiStreamEncoder(
        64, 64, shift=4, frames_per_batch=4,
        sink=lambda sid, b: files[sid].append(b),
    )
    for sid, fr in cams.items():
        enc.add_stream(sid, fr[0])  # first frame = prediction base
    for i in range(9):  # interleaved arrival, like real cameras
        for sid, fr in cams.items():
            enc.push_frame(sid, timestamp=1000 + i, frame=fr[i])
    enc.close()

    # ---- decode side: feed chunks in any interleaving
    got: dict[str, list] = {sid: [] for sid in cams}
    dec = MultiStreamDecoder(
        sink=lambda sid, imgs, ts: got[sid].append(imgs)
    )
    for sid in cams:
        dec.add_stream(sid)
    for sid in cams:
        for chunk in files[sid]:
            dec.feed(sid, chunk)
    dec.close()

    for sid, fr in cams.items():
        out = np.concatenate(got[sid])
        want = fr.astype(np.uint16) << 4
        assert (out == want).all(), sid
    print(f"{len(cams)} streams served losslessly, per-stream ordered")


if __name__ == "__main__":
    main()
