#!/usr/bin/env python
"""Minimal XSpace (.xplane.pb) reader: prints top ops by total duration.

The image has no tensorboard profile plugin, so this decodes the protobuf
wire format directly (XSpace -> XPlane -> XLine -> XEvent + metadata names).

Usage: python tools/parse_xplane.py /tmp/prof [top_n]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def iter_fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int) over a message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = read_varint(buf, i)
            yield field, wt, val
        elif wt == 2:
            ln, i = read_varint(buf, i)
            yield field, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield field, wt, buf[i:i + 4]
            i += 4
        elif wt == 1:
            yield field, wt, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def parse_event_metadata(buf):
    """XEventMetadata { id=1, name=2, display_name=3 }"""
    mid, name = None, ""
    for f, wt, v in iter_fields(buf):
        if f == 1 and wt == 0:
            mid = v
        elif f == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def parse_plane(buf):
    """XPlane { name=2, lines=3, event_metadata=4 (map) }"""
    name = ""
    metadata = {}
    lines = []
    for f, wt, v in iter_fields(buf):
        if f == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3 and wt == 2:
            lines.append(v)
        elif f == 4 and wt == 2:
            # map entry { key=1, value=2 }
            key, meta = None, None
            for ff, wwt, vv in iter_fields(v):
                if ff == 1 and wwt == 0:
                    key = vv
                elif ff == 2 and wwt == 2:
                    meta = vv
            if meta is not None:
                mid, mname = parse_event_metadata(meta)
                metadata[key if mid is None else mid] = mname
    return name, metadata, lines


def parse_line_events(buf):
    """XLine { name=2, events=4 or 6 }; XEvent { metadata_id=1, duration_ps=3 }

    The events field number differs across tsl profiler versions (observed 4
    on the current image, 6 historically) — accept either."""
    events = []
    for f, wt, v in iter_fields(buf):
        if f in (4, 6) and wt == 2:
            mid, dur = None, 0
            for ff, wwt, vv in iter_fields(v):
                if ff == 1 and wwt == 0:
                    mid = vv
                elif ff == 3 and wwt == 0:
                    dur = vv
            if mid is not None:
                events.append((mid, dur))
    return events


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no .xplane.pb under {root}")
        return
    for path in paths:
        print(f"== {path}")
        buf = open(path, "rb").read()
        for f, wt, v in iter_fields(buf):
            if f != 1 or wt != 2:
                continue
            pname, metadata, lines = parse_plane(v)
            durations = defaultdict(int)
            counts = defaultdict(int)
            for line in lines:
                for mid, dur in parse_line_events(line):
                    name = metadata.get(mid, f"meta{mid}")
                    durations[name] += dur
                    counts[name] += 1
            if not durations:
                continue
            total = sum(durations.values())
            print(f"-- plane '{pname}': {len(durations)} distinct events, "
                  f"total {total / 1e9:.3f}ms")
            ranked = sorted(durations.items(), key=lambda kv: -kv[1])
            for name, dur in ranked[:top_n]:
                print(f"   {dur / 1e9:10.3f}ms x{counts[name]:<5} {name[:90]}")


if __name__ == "__main__":
    main()
