"""Minimal XSpace (jax.profiler trace) parser — no tensorflow proto deps.

Hand-rolled protobuf wire-format reader for the stable XPlane schema;
aggregates device-plane op durations so TPU train-step time can be
attributed without the TensorBoard profile plugin (absent in this image).

Usage: python scripts/parse_xplane.py <trace.xplane.pb> [top_n]
"""

import collections
import re
import sys


def varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode()
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:  # map entry: key=1, value=2(XEventMetadata)
            k = None
            m = None
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    m = v2
            if m is not None:
                mname = ""
                mid = k
                for f3, w3, v3 in fields(m):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:
                        mname = v3.decode()
                meta[mid] = mname
    return name, lines, meta


def parse_events(line_buf):
    lname = ""
    evs = []
    for fno, wt, v in fields(line_buf):
        if fno == 2 and wt == 2:
            lname = v.decode()
        elif fno == 4 and wt == 2:
            mid = dur = 0
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
            evs.append((mid, dur))
    return lname, evs


def aggregate(path, top=45, steps=1, pat=None):
    space = open(path, "rb").read()
    out = []
    for fno, wt, v in fields(space):
        if fno != 1:
            continue
        name, lines, meta = parse_plane(v)
        agg = collections.Counter()
        cnt = collections.Counter()
        total = 0.0
        for lb in lines:
            lname, evs = parse_events(lb)
            for mid, dur in evs:
                n = meta.get(mid, str(mid))
                if pat and not re.search(pat, n):
                    continue
                agg[n] += dur / 1e9
                cnt[n] += 1
                total += dur / 1e9
        out.append((name, total, agg, cnt))
    return out


if __name__ == "__main__":
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    for name, total, agg, cnt in aggregate(path, top):
        if not agg:
            continue
        print(f"== plane {name!r}: total {total:.1f} ms over all lines")
        for n, ms in agg.most_common(top):
            print(f"{ms:9.2f} ms  x{cnt[n]:5d}  {n[:120]}")
        print()
