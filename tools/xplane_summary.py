#!/usr/bin/env python
"""Summarize a jax.profiler .xplane.pb into per-op device time.

The env's tensorboard_plugin_profile/tensorflow cannot parse xplane
protos (broken protobuf codegen), so this is a minimal hand-rolled
protobuf wire-format reader for the XSpace/XPlane/XLine/XEvent schema
(tensorflow/profiler/protobuf/xplane.proto).  Usage:

    python tools/xplane_summary.py <trace.xplane.pb> [top_n]

Prints per-plane tables of total device time per event (op) name,
descending.
"""
import struct
import sys
from collections import defaultdict


def _read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_event(buf):
    md, dur = 0, 0
    for fno, _wt, v in fields(buf):
        if fno == 1:
            md = v
        elif fno == 3:
            dur = v
    return md, dur


def parse_line(buf):
    name = ""
    events = []
    for fno, _wt, v in fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 6:
            events.append(parse_event(v))
    return name, events


def parse_event_metadata(buf):
    mid, name = 0, ""
    for fno, _wt, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def parse_plane(buf):
    name = ""
    lines = []
    evmeta = {}
    for fno, _wt, v in fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:
            # map<int64, XEventMetadata> entry: field1 key, field2 value
            k = None
            meta = (0, "")
            for f2, _w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    meta = parse_event_metadata(v2)
            evmeta[k if k is not None else meta[0]] = meta[1]
    return name, lines, evmeta


def summarize(path, top_n=40):
    data = open(path, "rb").read()
    for fno, _wt, v in fields(data):
        if fno != 1:
            continue
        name, lines, evmeta = parse_plane(v)
        per_op = defaultdict(int)
        line_tot = {}
        for lname, events in lines:
            t = 0
            for mid, dur in events:
                per_op[evmeta.get(mid, str(mid))] += dur
                t += dur
            line_tot[lname] = line_tot.get(lname, 0) + t
        if not per_op:
            continue
        print(f"== plane: {name}")
        for lname, t in sorted(line_tot.items(), key=lambda kv: -kv[1]):
            print(f"   line {lname}: {t / 1e9:.3f} ms total")
        rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
        for opname, ps in rows:
            print(f"  {ps / 1e9:10.3f} ms  {opname[:120]}")


if __name__ == "__main__":
    summarize(sys.argv[1],
              int(sys.argv[2]) if len(sys.argv) > 2 else 40)
