#!/usr/bin/env python3
"""Regenerate PINNED_BASELINE.md from >=3 clean interleaved sweep dumps.

Usage: python3 scripts/pin_baseline.py <commit> sweep1.json sweep2.json [...]

Each input is a `target/bench_full.json` copied aside after a clean
full-tier sweep. Per query the pinned number is the MEDIAN of the sweep
medians (each itself an interleaved median of 3 passes). Queries present
in only some sweeps get the median of what exists, with the sweep count
recorded. The header's judging rules are preserved verbatim.
"""
import json
import statistics
import sys

commit = sys.argv[1]
ROUND = 16
sweeps = [json.load(open(p)) for p in sys.argv[2:]]
assert len(sweeps) >= 3, "need >= 3 clean sweeps"

names = sorted({n for s in sweeps for n in s["queries"]})
rows = []
for n in names:
    vals = [s["queries"][n] for s in sweeps
            if isinstance(s["queries"].get(n), (int, float))]
    if not vals:
        continue
    rows.append((n, statistics.median(vals), len(vals)))

total = sum(v for _, v, _ in rows)
sweep_heads = ", ".join(
    f"{s['value']} s / {s['n_queries']}" for s in sweeps)

HEADER = f"""# PINNED BASELINE — absolute per-query anchor (round {ROUND})

The round-over-round bench gate compares against the PREVIOUS round's
sweep, which round 11/12 showed can itself be contention-noised. This
file pins an ABSOLUTE anchor: per-query p50 across {len(sweeps)} clean
interleaved full-tier sweeps of the round-{ROUND} code ({len(rows)} queries,
sf0.1, local[32], `SPARK_GRAFT_BENCH_TIER=full` = interleaved
median-of-3 with per-pass shuffled order — so each pinned number is the
median of {len(sweeps)} sweep-medians, {3 * len(sweeps)} samples).

## How to judge a future sweep against this file

1. Compare each query's sweep median to its pinned p50. A query is a
   REGRESSION CANDIDATE when it exceeds max(2× pinned, pinned + 1 s).
2. For each candidate, read its diag rows in `target/bench_full.json`
   (`[heapMB, gcSec, storageMB, loadavg, scopedPending]`, one snapshot
   per pass):
   - gcSec ≈ the excess → GC debt (code-visible, usually benign);
   - flat gcSec + loadavg well above the worker count → co-tenant
     contention; substitute a same-process rerun median
     (`SPARK_GRAFT_BENCH_ONLY=<q>`) — substitution is allowed ONLY with
     that flat-gc/high-loadavg evidence, and the rerun must be reported
     beside the sweep number, never silently.
3. The sweep TOTAL is judged after substitutions; the 2×-of-baseline
   contract applies to the substituted total.
4. New queries (absent here) are judged round-over-round until the next
   baseline refresh; refresh this file only from ≥3 clean sweeps of a
   committed tree, and record the commit hash.

## Environment caveat

These numbers are from a shared 32-CPU VM whose ambient load swings
totals ±10% between clean sweeps. The per-query p50 of {len(sweeps)}
interleaved sweeps sheds most of that, but a single co-tenant window
can still inflate isolated queries — hence the substitution rule above.
Since round 14 each pass runs in a deterministically SHUFFLED order, so
a long co-tenant window lands on a different query subset per pass and
the medians shed it.

## Anchor

- commit: {commit} (round {ROUND}, {len(rows)}-query surface)
- sweeps: {len(sweeps)} clean interleaved full-tier sweeps at sf0.1
  local[32] — {sweep_heads}.
- ESTIMATOR NOTE: these are INTERLEAVED medians (each sample is a
  spaced single run). They read ~1.3x sequential back-to-back medians
  (warm repeats) on identical code — do NOT compare a pinned p50
  against a sequential-tier number; the driver and this file use the
  same interleaved estimator.

Pinned p50 TOTAL: **{total:.2f} s / {len(rows)} queries** (sum of per-query p50s).

| query | p50 (s) | sweeps |
|---|---|---|
"""

with open("PINNED_BASELINE.md", "w") as f:
    f.write(HEADER)
    for n, v, k in rows:
        f.write(f"| {n} | {v:.2f} | {k} |\n")
print(f"pinned {len(rows)} queries, total {total:.2f} s, commit {commit}")
