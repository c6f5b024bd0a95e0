#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage: python3 tools/bench_gate.py BENCH_new.json [BENCH_old.json] [--max-ratio 2.0] [--no-retime]

With no BENCH_old.json, compares against the latest committed
BENCH_LOCAL_r{N}.json round record (never a rolling/mid-round file —
a mid-round regression must not become its own baseline).

Compares the per-query seconds of two Bench JSON outputs (the one-line
{"metric":"total",...,"queries":{...}} format) and FAILS (exit 1),
loudly, if any query shared by both runs regressed by more than
--max-ratio (default 2x). Queries present in only one run are listed
informationally and never fail the gate (new queries have no baseline).

Flagged ratio regressions are AUTO-RETIMED once (a fresh Bench run
restricted to the flagged queries via SPARK_GRAFT_ONLY, same sf dir as
the new run) before the gate reports: this machine shows bursty
external load, and rounds 2/4/6 each burned a triage cycle on 2-4x
"regressions" that vanished on an idle re-run. A flag that clears on
re-time is reported as phantom, not failed. --no-retime skips this
(e.g. when the binary that produced BENCH_new is no longer current).

Sub-0.2s queries are ignored for the ratio check: at that floor the
timing is dominated by the fixed per-job cost and a 2x swing is noise,
not a plan change.

Run it after every bench before committing perf-sensitive changes:
the round-2 q24/q31 "regressions" slipped in silently because nothing
compared the new numbers against the previous round.
"""
import json
import os
import re
import subprocess
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
    wrapper_sf = None
    try:
        wrapper = json.loads(txt)
        if isinstance(wrapper, dict) and isinstance(wrapper.get('parsed'), dict):
            return wrapper['parsed']
        if isinstance(wrapper, dict):
            tail = wrapper.get('tail', '')
            wrapper_sf = wrapper.get('sf')
        else:
            tail = ''
    except json.JSONDecodeError:
        tail = txt
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'"(q\d+[a-z0-9_]*)":(-?\d+(?:\.\d+)?)', tail)}
    if not qs:
        raise SystemExit(f"no bench JSON line found in {path}")
    out = {'queries': qs}
    # Propagate the scale-factor dir so a retime re-measures on the SAME
    # sf the flagged run used (a truncated tail usually keeps the
    # trailing "sf":"..." field; the wrapper may also record it). If
    # neither survives, main() skips the retime rather than silently
    # re-measuring on the default sf.
    m = re.search(r'"sf":"([^"]*)"', tail)
    if m:
        out['sf'] = m.group(1)
    elif isinstance(wrapper_sf, str):
        out['sf'] = wrapper_sf
    return out


def control_refs(rec):
    """The epoch control times a record normalized against: control ->
    ref seconds, read from any checkpoint block (all three carry the
    same ref vector)."""
    for tag in ('controls_end', 'controls_mid', 'controls_start'):
        blk = rec.get(tag)
        if isinstance(blk, dict):
            out = {c: v.get('ref') for c, v in blk.items()
                   if isinstance(v, dict)
                   and isinstance(v.get('ref'), (int, float))}
            if out:
                return out
    return {}


def retime(queries, sf_dir):
    """Re-run Bench restricted to `queries` (min-of-3 inside Bench) and
    return its per-query seconds. Empty dict on any failure — the gate
    then falls back to the original (flagged) numbers."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=','.join(sorted(queries)),
               SPARK_GRAFT_CPUS=os.environ.get('SPARK_GRAFT_CPUS', '32'))
    print(f"  re-timing {len(queries)} flagged quer"
          f"{'y' if len(queries) == 1 else 'ies'} on {sf_dir} ...")
    try:
        proc = subprocess.run(['sbt', '-batch', 'runMain graft.Bench'],
                              cwd=repo, env=env, capture_output=True,
                              text=True, timeout=1800)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"  retime run failed ({e}); keeping original numbers")
        return {}
    for line in reversed(proc.stdout.splitlines()):
        if '"metric"' in line:
            return json.loads(line[line.index('{'):]).get('queries', {})
    print("  retime produced no bench JSON; keeping original numbers")
    return {}


def main():
    argv = sys.argv[1:]
    args = []
    max_ratio = 2.0
    do_retime = True
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == '--no-retime':
            do_retime = False
        elif a == '--max-ratio' or a.startswith('--max-ratio='):
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
    # Baseline default: the latest COMMITTED per-round record
    # (BENCH_LOCAL_r{N}.json), NOT a rolling file like
    # target/bench_last.json. Round-13 lesson (judge-caught): gating
    # against the rolling record let a mid-round regression become its
    # own baseline — the q46 2.3x slip passed the gate because
    # bench_last.json had already absorbed it.
    if len(args) == 1:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        new_abs = os.path.abspath(args[0])
        # "committed" must mean COMMITTED: filter through git ls-files
        # so an uncommitted/abandoned r{N+1} record lying in the
        # working directory cannot silently become the baseline (that
        # would recreate the exact mid-round self-baselining failure
        # this default exists to prevent). Directory listing is only
        # the fallback when git itself is unavailable.
        try:
            tracked = set(subprocess.run(
                ['git', '-C', repo, 'ls-files', 'BENCH_LOCAL_r*.json'],
                capture_output=True, text=True, check=True,
            ).stdout.split())
        except (OSError, subprocess.CalledProcessError):
            tracked = None  # git unavailable: fall back to the listing
        committed = sorted(
            (f for f in os.listdir(repo)
             if re.fullmatch(r'BENCH_LOCAL_r(\d+)\.json', f)
             and (tracked is None or f in tracked)
             and os.path.abspath(os.path.join(repo, f)) != new_abs),
            key=lambda f: int(re.search(r'(\d+)', f).group(1)))
        if not committed:
            raise SystemExit("no committed BENCH_LOCAL_r*.json baseline found\n"
                             + __doc__)
        args.append(os.path.join(repo, committed[-1]))
        print(f"baseline: {committed[-1]} (latest committed round record)")
    if len(args) != 2:
        raise SystemExit(__doc__)
    floor = 0.2

    new, old = load(args[0]), load(args[1])
    nq, oq = new['queries'], old['queries']
    # Round-18: when BOTH records carry the in-record load normalization
    # (per-query normalized_s from the start/mid/end control-trio
    # checkpoints), gate on the normalized values — that is exactly the
    # ambient-load correction the auto-retime pass approximates, so the
    # retime is skipped too (a fresh raw retime is not comparable to a
    # normalized baseline). Raw maps remain in the records for anyone
    # who wants them.
    # ... but ONLY when both were normalized against the SAME reference
    # epoch: normalized_s values are seconds in ref-epoch units, and
    # dividing r15-epoch units by r18-epoch units would bake a silent
    # per-round drift factor into every ratio.
    if isinstance(new.get('normalized_s'), dict) and \
            isinstance(old.get('normalized_s'), dict):
        if new.get('control_ref') == old.get('control_ref'):
            nq, oq = dict(new['normalized_s']), dict(old['normalized_s'])
            do_retime = False
            print("gating on normalized_s (both records carry control-trio "
                  f"normalization vs {new.get('control_ref')}); "
                  "auto-retime disabled")
        else:
            # Different epochs: chain-convert the baseline into the new
            # record's epoch units via the ratio of the two epochs'
            # control times (normalized_E2 = normalized_E1 ·
            # E2_ref(c)/E1_ref(c); median over the shared control trio).
            # r18 ADVICE: without this, any ref drift silently dropped
            # the gate back to raw seconds.
            nrefs, orefs = control_refs(new), control_refs(old)
            factors = sorted(nrefs[c] / orefs[c]
                             for c in set(nrefs) & set(orefs)
                             if orefs[c] > 0)
            if factors:
                f = factors[len(factors) // 2]
                nq = dict(new['normalized_s'])
                oq = {q: v * f if v >= 0 else v
                      for q, v in old['normalized_s'].items()}
                do_retime = False
                print("gating on normalized_s with EPOCH CHAIN-CONVERSION: "
                      f"baseline units ({old.get('control_ref')}) x {f:.3f} "
                      f"-> new epoch units ({new.get('control_ref')}); "
                      f"factor = median over {len(factors)} shared controls; "
                      "auto-retime disabled")
            else:
                print("both records carry normalized_s but against different "
                      f"control refs ({new.get('control_ref')} vs "
                      f"{old.get('control_ref')}) and no shared control trio "
                      "to chain-convert through; gating on RAW seconds")
    shared = sorted(set(nq) & set(oq))
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))

    def find_failures(times):
        fails = []
        # a new query with no baseline is informational UNLESS it failed —
        # a -1 must never pass the gate just because it is new
        for q in only_new:
            if times[q] < 0:
                fails.append((q, times[q], float('nan'), 'failed run (-1, new query)'))
        for q in shared:
            a, b = times[q], oq[q]
            if a < 0 or b < 0:
                fails.append((q, a, b, 'failed run (-1)'))
                continue
            if max(a, b) < floor:
                continue
            if b > 0 and a / b > max_ratio:
                fails.append((q, a, b, f'{a / b:.2f}x'))
        return fails

    failures = find_failures(nq)
    # Ratio flags get ONE re-measurement before the gate believes them
    # (-1 hard failures are real and are never retimed away).
    ratio_flagged = [q for q, a, b, why in failures if why.endswith('x')]
    if ratio_flagged and do_retime and 'sf' not in new:
        # unknown scale factor (fully truncated tail): a retime on a
        # guessed sf dir would compare apples to oranges
        print(f"  WARNING: {args[0]} records no sf dir; skipping auto-retime "
              f"of {len(ratio_flagged)} flagged quer"
              f"{'y' if len(ratio_flagged) == 1 else 'ies'} "
              "(re-run the gate against a full bench record to retime)")
        do_retime = False
    if ratio_flagged and do_retime:
        fresh = retime(ratio_flagged, new['sf'])
        cleared = []
        for q in ratio_flagged:
            if q in fresh and 0 <= fresh[q] < nq[q]:
                if fresh[q] / oq[q] <= max_ratio or max(fresh[q], oq[q]) < floor:
                    cleared.append((q, nq[q], fresh[q]))
                nq[q] = fresh[q]
        for q, was, now in cleared:
            print(f"  phantom regression (load burst): {q} {was:.2f}s "
                  f"-> {now:.2f}s on re-time, within gate")
        failures = find_failures(nq)

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
