"""``fpv-inspect``: byte-level accounting of an FPVT file.

Prints where every byte goes — per section, per plane stream, split into
tables / chunk states / group counts / rANS payload — so compression-ratio
regressions can be attributed to a component instead of guessed at.  The
observability counterpart of the reference's per-frame stat prints
(/root/reference/benchmark.cc:68-85), at sub-stream granularity.

Usage: python -m fpv_tpu.cli.inspect file.fpvt  (or inspect_bytes(data))
"""

from __future__ import annotations

import struct
import sys

from fpv_tpu.format import fpvt


def _stream_breakdown(ps) -> dict:
    """Byte accounting of one serialized plane stream (v4 layout)."""
    return fpvt.plane_stream_accounting(ps)


def inspect_bytes(data: bytes) -> dict:
    """Full-file accounting -> nested dict (also printable via main)."""
    header = fpvt.Header.parse(data)
    out = {
        "file_bytes": len(data),
        "header_bytes": fpvt.HEADER_SIZE,
        "sections": [],
    }
    # geometry-validated parses, like the readers: crafted plane_size /
    # nframes fields must not drive a read-only accounting tool into
    # multi-GB allocations
    psize = header.ysize * header.xsize
    pvsize = (header.ysize // 4) * (header.xsize // 4)
    pos = fpvt.HEADER_SIZE
    while pos < len(data):
        if len(data) - pos < 9:
            raise ValueError("truncated section header")
        size, stype = struct.unpack_from("<QB", data, pos)
        # a section is at least its own (size, type) header; a crafted
        # size=0 would otherwise loop here forever
        if size < 9 or size > len(data) - pos:
            raise ValueError("corrupt section size")
        if stype == fpvt.SECTION_DELTA:
            dflags, hs, ls = fpvt.parse_delta_section(
                data, pos, plane_size=psize
            )
            entry = {
                "type": "delta",
                "bytes": size,
                "planes": {"high": _stream_breakdown(hs)},
            }
            if ls is not None:
                entry["planes"]["low"] = _stream_breakdown(ls)
            out["sections"].append(entry)
        elif stype == fpvt.SECTION_BATCH:
            pb = fpvt.parse_batch_section(
                data, pos, plane_size=psize, preview_size=pvsize
            )
            entry = {
                "type": "batch",
                "bytes": size,
                "nframes": len(pb.frame_flags),
                "flags_ts_bytes": 9 * len(pb.frame_flags),
                "planes": {"high": _stream_breakdown(pb.high)},
            }
            if pb.low is not None:
                entry["planes"]["low"] = _stream_breakdown(pb.low)
            if pb.preview is not None:
                entry["planes"]["preview"] = _stream_breakdown(pb.preview)
            out["sections"].append(entry)
        elif stype == fpvt.SECTION_INDEX:
            out["sections"].append({"type": "index", "bytes": size})
        else:
            raise ValueError(f"unknown section type {stype}")
        pos += size
    # totals by component across all plane streams
    totals = {"tables": 0, "states": 0, "counts": 0, "payload": 0,
              "stream_headers": 0}
    for sec in out["sections"]:
        for br in sec.get("planes", {}).values():
            for k in totals:
                totals[k] += br[k]
    out["totals"] = totals
    out["npixels_hint"] = header.xsize * header.ysize
    return out


def format_report(info: dict) -> str:
    lines = [f"file: {info['file_bytes']} B"]
    for sec in info["sections"]:
        extra = f" x{sec['nframes']}" if "nframes" in sec else ""
        lines.append(f"  [{sec['type']}{extra}] {sec['bytes']} B")
        for name, br in sec.get("planes", {}).items():
            lines.append(
                f"    {name:8s} {br['total']:>10d} B  "
                f"(tables {br['tables']}, states {br['states']}, "
                f"counts {br['counts']}, payload {br['payload']}, "
                f"hdr {br['stream_headers']}, coding {br['coding']})"
            )
    t = info["totals"]
    lines.append(
        f"  totals: tables {t['tables']}  states {t['states']}  "
        f"counts {t['counts']}  payload {t['payload']}  "
        f"stream-hdrs {t['stream_headers']}"
    )
    return "\n".join(lines)


def check_bytes(data: bytes) -> list[str]:
    """Decode-verify every batch section -> list of failure strings.

    The rANS chunk states double as integrity checks (rans_layout docs):
    a corrupt payload that still parses decodes to mismatching final
    states, which the engines surface as ValueError.  This walks the
    file's sections through the real decode path and reports per-batch
    results — the ops counterpart of the reference benchmark's roundtrip
    verification (/root/reference/benchmark.cc:193-285), usable without
    the original raw capture."""
    from fpv_tpu.api.fpvt_codec import FpvtReader

    failures: list[str] = []
    try:
        rdr = FpvtReader(data)
    except ValueError as e:
        return [f"unreadable file: {e}"]
    for i in range(rdr.num_batches):
        try:
            rdr.decode_batch(i)
        except ValueError as e:
            failures.append(f"batch {i}: {e}")
    return failures


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    check = "--check" in argv
    if check:
        argv.remove("--check")
    if len(argv) != 1:
        print("usage: fpv-inspect [--check] file.fpvt", file=sys.stderr)
        return 2
    with open(argv[0], "rb") as f:
        data = f.read()
    print(format_report(inspect_bytes(data)))
    if check:
        failures = check_bytes(data)
        for msg in failures:
            print(f"CHECK FAIL: {msg}", file=sys.stderr)
        print("check: " + ("FAILED" if failures else "ok (all batches decode)"))
        return 1 if failures else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
