#!/usr/bin/env python3
"""Suite-median-normalized bench comparison.

Usage: python3 tools/bench_compare.py [BASELINE [CURRENT]] [--prev PREV]
       (defaults: BASELINE_BENCH.json BENCH_LOCAL.json)

--prev BENCH_r{N-1}_full.json additionally compares CURRENT against the
previous round's sealed per-query history (the comparison the r11
verdict ran by hand) — same normalization, same flags, and the exit
code covers BOTH comparisons. Seal checklist runs:
  python3 tools/bench_compare.py --prev BENCH_r{N-1}_full.json

The CLAUDE.md variance protocol, made mechanical: whole-suite inflations
up to ~1.3x are environment (VM noise), so raw per-query ratios are
meaningless — each query's ratio is divided by the SUITE MEDIAN ratio
first. A normalized ratio > FLAG_HI (default 1.5) is a candidate real
regression -> isolation-run it (SPARK_GRAFT_QUERIES=<q> runMain
graft.Bench, which writes BENCH_SUBSET.json) before believing it.

Exit code 1 if any query exceeds FLAG_HI after normalization (so the
check is scriptable); 0 otherwise.
"""
import json
import re
import statistics
import sys

FLAG_HI = 1.5
FLAG_LO = 1 / FLAG_HI


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "tail" in d:
        # driver BENCH_rN.json: the bench line survives only as a (possibly
        # head-truncated) "tail" string — regex the per-query pairs out
        d = dict(d)
        d["queries"] = {m.group(1): float(m.group(2)) for m in re.finditer(
            r'"([a-z0-9_]+)":(-?[0-9]+\.[0-9]+)', d["tail"])}
        for k in ("load_avg", "value"):
            d[k] = d["queries"].pop(k, d.get(k))
    return d


def compare(base_path, cur_path):
    base, cur = load(base_path), load(cur_path)
    bq = {k: v for k, v in base["queries"].items() if v >= 0}
    cq = {k: v for k, v in cur["queries"].items() if v >= 0}
    common = sorted(set(bq) & set(cq))
    if not common:
        print("no common queries")
        return 2
    # floor at 50 ms: ratios of two timer-noise-sized numbers are not signal
    ratios = {k: max(cq[k], 0.05) / max(bq[k], 0.05) for k in common}
    med = statistics.median(ratios.values())
    norm = {k: r / med for k, r in ratios.items()}
    print(f"baseline {base_path}: total={base.get('value')}s "
          f"load={base.get('load_avg')} n={len(bq)}")
    print(f"current  {cur_path}: total={cur.get('value')}s "
          f"load={cur.get('load_avg')}"
          + (f" start_load={cur.get('load1')}/{cur.get('load5')}/"
             f"{cur.get('load15')}" if cur.get('load15') is not None else "")
          + f" n={len(cq)}")
    print(f"common={len(common)}  suite-median ratio={med:.3f} "
          f"(environment factor; per-query ratios below are divided by it)")
    slow = sorted((k for k in common if norm[k] > FLAG_HI),
                  key=lambda k: -norm[k])
    fast = sorted((k for k in common if norm[k] < FLAG_LO),
                  key=lambda k: norm[k])
    gc = cur.get("gc_ms", {})
    for k in slow:
        gnote = f" gc={gc[k]}ms" if k in gc else ""
        print(f"  SLOWER {norm[k]:5.2f}x  {k}  "
              f"({bq[k]:.3f}s -> {cq[k]:.3f}s{gnote})")
    for k in fast:
        print(f"  faster {norm[k]:5.2f}x  {k}  "
              f"({bq[k]:.3f}s -> {cq[k]:.3f}s)")
    only_new = sorted(set(cq) - set(bq))
    if only_new:
        tot = sum(cq[k] for k in only_new)
        print(f"new queries (not in baseline): {len(only_new)}, {tot:.1f}s total")
    errs = cur.get("errors", [])
    if errs:
        print(f"ERRORS in current run: {errs}")
    if not slow and not errs:
        print("OK: no query exceeds the normalized regression threshold")
    return 1 if (slow or errs) else 0


def main():
    argv = sys.argv[1:]
    prev_path = None
    if "--prev" in argv:
        i = argv.index("--prev")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: bench_compare.py [BASELINE] [CURRENT] "
                  "[--prev BENCH_r{N-1}_full.json]")
            return 2
        prev_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    base_path = argv[0] if len(argv) > 0 else "BASELINE_BENCH.json"
    cur_path = argv[1] if len(argv) > 1 else "BENCH_LOCAL.json"
    rc = compare(base_path, cur_path)
    if prev_path:
        print()
        print(f"=== vs previous round ({prev_path}) ===")
        rc = max(rc, compare(prev_path, cur_path))
    return rc


if __name__ == "__main__":
    sys.exit(main())
