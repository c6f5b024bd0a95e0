#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage: python3 tools/bench_gate.py BENCH_new.json BENCH_old.json [--max-ratio 2.0]

Compares the per-query seconds of two Bench JSON outputs (the one-line
{"metric":"total",...,"queries":{...}} format) and FAILS (exit 1),
loudly, if any query shared by both runs regressed by more than
--max-ratio (default 2x). Queries present in only one run are listed
informationally and never fail the gate (new queries have no baseline).

Sub-0.2s queries are ignored for the ratio check: at that floor the
timing is dominated by the fixed per-job cost and a 2x swing is noise,
not a plan change.

Run it after every bench before committing perf-sensitive changes:
the round-2 q24/q31 "regressions" slipped in silently because nothing
compared the new numbers against the previous round.
"""
import json
import re
import sys


def load(path):
    """Accepts either raw Bench stdout (or a log containing its one
    JSON line) or the driver's BENCH_rN.json wrapper, whose 'tail'
    field holds a possibly front-truncated slice of that stdout. Falls
    back to regex-scraping "qNN_name":seconds pairs, which survives
    truncation (at worst the first query of a truncated tail is lost
    and simply isn't compared)."""
    with open(path) as f:
        txt = f.read().strip()
    for line in reversed(txt.splitlines()):
        if '"metric"' in line:
            return json.loads(line[line.index('{'):])
    try:
        wrapper = json.loads(txt)
        if isinstance(wrapper, dict) and isinstance(wrapper.get('parsed'), dict):
            return wrapper['parsed']
        tail = wrapper.get('tail', '') if isinstance(wrapper, dict) else ''
    except json.JSONDecodeError:
        tail = txt
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'"(q\d+[a-z0-9_]*)":(-?\d+(?:\.\d+)?)', tail)}
    if not qs:
        raise SystemExit(f"no bench JSON line found in {path}")
    return {'queries': qs}


def main():
    argv = sys.argv[1:]
    args = []
    max_ratio = 2.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == '--max-ratio' or a.startswith('--max-ratio='):
            if '=' in a:
                raw = a.split('=', 1)[1]
            else:  # space-separated form: consume the value token too
                if i + 1 >= len(argv):
                    raise SystemExit(f"--max-ratio needs a value\n{__doc__}")
                i += 1
                raw = argv[i]
            try:
                max_ratio = float(raw)
            except ValueError:
                raise SystemExit(f"--max-ratio: not a number: {raw!r}\n{__doc__}")
        elif a.startswith('--'):
            raise SystemExit(f"unknown option {a}\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    floor = 0.2

    new, old = load(args[0]), load(args[1])
    nq, oq = new['queries'], old['queries']
    shared = sorted(set(nq) & set(oq))
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))

    failures = []
    # a new query with no baseline is informational UNLESS it failed —
    # a -1 must never pass the gate just because it is new
    for q in only_new:
        if nq[q] < 0:
            failures.append((q, nq[q], float('nan'), 'failed run (-1, new query)'))
    for q in shared:
        a, b = nq[q], oq[q]
        if a < 0 or b < 0:
            failures.append((q, a, b, 'failed run (-1)'))
            continue
        if max(a, b) < floor:
            continue
        if b > 0 and a / b > max_ratio:
            failures.append((q, a, b, f'{a / b:.2f}x'))

    print(f"bench gate: {len(shared)} shared queries, "
          f"new total {sum(v for v in nq.values() if v >= 0):.1f}s "
          f"vs old {sum(v for v in oq.values() if v >= 0):.1f}s")
    for q in only_new:
        print(f"  new (no baseline): {q} {nq[q]:.2f}s")
    for q in only_old:
        print(f"  removed: {q}")
    if failures:
        print(f"FAIL: {len(failures)} quer{'y' if len(failures) == 1 else 'ies'} "
              f"regressed >{max_ratio}x:")
        for q, a, b, why in failures:
            print(f"  {q}: {b:.2f}s -> {a:.2f}s ({why})")
        sys.exit(1)
    print(f"OK: no per-query regression >{max_ratio}x (ignoring <{floor}s noise floor)")


if __name__ == '__main__':
    main()
