#!/usr/bin/env python3
"""Regenerate the authoritative per-query sf0.1 pin table (markdown)
from a committed BENCH_LOCAL_r{N}.json record.

Usage: python3 tools/pin_table.py BENCH_LOCAL_r19.json > /tmp/pins.md

Emits one row per query: raw min-of-3 seconds and the record's own
normalized_s (ref-epoch units). The table inherits its provenance from
ONE epoch header the caller writes above it (commit, conditions,
control reference) — the r18 verdict's single-regime convention: every
pin's provenance must be derivable from BASELINE.md alone, and the
pin set must track honest current cost (a pin table 1.6x above honest
cost is phantom headroom a real regression can hide under).
"""
import json
import sys


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    with open(sys.argv[1]) as f:
        txt = f.read().strip()
    rec = None
    for line in reversed(txt.splitlines()):
        if '"metric"' in line:
            rec = json.loads(line[line.index('{'):])
            break
    if rec is None:
        raise SystemExit(f"no bench JSON line in {sys.argv[1]}")
    qs = rec['queries']
    ns = rec.get('normalized_s', {})
    print("| query | sf0.1 raw (s) | normalized (s) |")
    print("|---|---|---|")
    for q in sorted(qs):
        n = ns.get(q)
        nstr = f"{n:.2f}" if isinstance(n, (int, float)) else "—"
        print(f"| {q} | {qs[q]:.2f} | {nstr} |")
    tot = sum(v for v in qs.values() if v >= 0)
    ntot = sum(v for v in ns.values() if isinstance(v, (int, float)) and v >= 0)
    print(f"\nTotals: {tot:.1f} s raw / {ntot:.1f} s normalized over "
          f"{len(qs)} queries.", file=sys.stderr)


if __name__ == '__main__':
    main()
