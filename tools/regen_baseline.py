#!/usr/bin/env python3
"""Regenerate BENCH_BASELINE.json in the dispersion-aware schema.

Per query: {"min": best-known solo seconds, "median": median over all
recorded per-round driver artifacts, "n": number of rounds observed}.
The median is what the steal-guard's suspect rule compares against
(max(1.5*median, 1.5*min+150ms)) so a one-off quiet-host outlier min
(e.g. q_ann_ivf's historical 0.667 vs its 1.1-1.8 steady state) stops
flagging every round while a real regression still trips.

Inputs: BENCH_r*.json driver artifacts (the "tail" field carries the
bench JSON line, possibly truncated), BENCH_SELF.json (last full run),
and the previous BENCH_BASELINE.json (either the legacy flat schema or
this one) whose mins are preserved -- the min can only go down.

Usage: python3 tools/regen_baseline.py [--write] [extra_bench.json ...]
"""
import glob
import json
import os
import re
import statistics
import sys

# driver artifacts embed the bench line inside a JSON string ("tail"),
# so the quotes around query names may arrive backslash-escaped
QUERY_RE = re.compile(r'"(q[A-Za-z0-9_]*|q1_agg)\\?":([0-9]+\.[0-9]+)')
NESTED_RE = re.compile(
    r'"(q[A-Za-z0-9_]*|q1_agg)":\{"min":([0-9.]+),"median":([0-9.]+),'
    r'"n":([0-9]+)\}')


def parse_times(path):
    """Per-query seconds from one bench artifact (flat schema only)."""
    try:
        txt = open(path).read()
    except OSError:
        return {}
    # driver artifacts wrap the bench line in a JSON with a "tail"
    # field; BENCH_SELF.json is the raw line. Both regex-parse the
    # same way, but a truncated tail can cut a query mid-number --
    # drop the last match of a truncated artifact to be safe.
    pairs = [(m.group(1), float(m.group(2)))
             for m in QUERY_RE.finditer(txt)]
    if '"tail"' in txt and not txt.rstrip().endswith('}'):
        pairs = pairs[:-1]
    return dict(pairs)


def parse_baseline(path):
    """(mins, medians, ns) from the previous baseline, either schema."""
    try:
        txt = open(path).read()
    except OSError:
        return {}, {}, {}
    nested = list(NESTED_RE.finditer(txt))
    if nested:
        return ({m.group(1): float(m.group(2)) for m in nested},
                {m.group(1): float(m.group(3)) for m in nested},
                {m.group(1): int(m.group(4)) for m in nested})
    return ({m.group(1): float(m.group(2))
             for m in QUERY_RE.finditer(txt)}, {}, {})


def main():
    write = '--write' in sys.argv
    extra = [a for a in sys.argv[1:] if not a.startswith('--')]
    prev_min, _, _ = parse_baseline('BENCH_BASELINE.json')

    # BENCH_SELF.json is the latest full run — its mins are what Bench
    # compared against last round and must survive regeneration
    rounds = (sorted(glob.glob('BENCH_r*.json'))
              + [p for p in ['BENCH_SELF.json'] if os.path.exists(p)]
              + extra)
    per_query = {}
    for path in rounds:
        for q, t in parse_times(path).items():
            per_query.setdefault(q, []).append(t)

    queries = {}
    for q in sorted(set(per_query) | set(prev_min)):
        obs = per_query.get(q, [])
        mn = min(obs + [prev_min.get(q, float('inf'))])
        med = statistics.median(obs) if obs else mn
        queries[q] = {'min': round(mn, 3), 'median': round(med, 3),
                      'n': len(obs)}

    doc = ('per-query reference: min = best-known solo seconds over all '
           'recorded rounds (can only decrease); median = median of the '
           'per-round driver artifacts (dispersion-aware); n = rounds '
           'observed. Bench suspect rule: best-of-3 > '
           'max(1.5*median, 1.5*min+0.15)')
    lines = ['{', '"_doc":%s,' % json.dumps(doc), '"queries":{']
    body = [('"%s":{"min":%s,"median":%s,"n":%d}'
             % (q, v['min'], v['median'], v['n']))
            for q, v in queries.items()]
    lines.append(',\n'.join(body))
    lines.append('}}')
    out = '\n'.join(lines)
    if write:
        with open('BENCH_BASELINE.json', 'w') as f:
            f.write(out + '\n')
        print('wrote BENCH_BASELINE.json: %d queries' % len(queries))
    else:
        print(out)


if __name__ == '__main__':
    main()
