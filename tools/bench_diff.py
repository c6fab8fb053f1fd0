#!/usr/bin/env python3
"""Per-family bench artifact diff (VERDICT r15 task 1).

Usage: python3 tools/bench_diff.py <a.jsonl-or-round.json> <b.jsonl-or-round.json> [--top N]

Each input is either a Bench stdout/jsonl artifact (one JSON object per
line, `queries` + `total` metric lines) or a committed BENCH_r{N}.json
(driver wrapper with a `parsed` total and a stdout `tail` — per-key maps
survive only in .jsonl artifacts, so round files older than r16 may lack
them).

Prints: both calibrations, raw and calibration-normalized totals, a
per-family (key-prefix) subtotal table with deltas, and the top-N per-key
regressions/improvements — the controlled-A/B readout the r15 drift
question needs.
"""
import json
import sys


def load(path):
    """-> (queries: {key: sec}, total_line: dict)"""
    txt = open(path, encoding="utf-8").read()
    queries, total = None, None
    try:
        d = json.loads(txt)
        if isinstance(d, dict) and "parsed" in d:  # BENCH_r{N}.json wrapper
            total = d["parsed"]
            for ln in d.get("tail", "").splitlines():
                ln = ln.strip()
                if ln.startswith("{"):
                    try:
                        p = json.loads(ln)
                        if p.get("metric") == "queries":
                            queries = p["queries"]
                    except json.JSONDecodeError:
                        pass
            return queries, total
    except json.JSONDecodeError:
        pass
    for ln in txt.splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            p = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if p.get("metric") == "queries":
            queries = p["queries"]
        elif p.get("metric") == "total":
            total = p
    return queries, total


def family(key):
    return key.split("_", 1)[0]


def main():
    top = 12
    argv = sys.argv[1:]
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    pa, pb = argv
    qa, ta = load(pa)
    qb, tb = load(pb)
    for path, t in ((pa, ta), (pb, tb)):
        if t is None or "total_ok" not in t:
            sys.exit(f"{path}: no total line (truncated or crashed sweep?) "
                     "— nothing to diff")
    ca, cb = ta.get("calibration_sec"), tb.get("calibration_sec")
    print(f"A: {pa}")
    print(f"   total_ok={ta['total_ok']:.1f}s n={ta['n_queries']} "
          f"calib={ca} end={ta.get('calibration_end_sec', '-')} "
          f"drift={ta.get('calibration_drift', '-')}")
    print(f"B: {pb}")
    print(f"   total_ok={tb['total_ok']:.1f}s n={tb['n_queries']} "
          f"calib={cb} end={tb.get('calibration_end_sec', '-')} "
          f"drift={tb.get('calibration_drift', '-')}")
    if ca and cb:
        print(f"B normalized to A's calibration (x {ca}/{cb}): "
              f"{tb['total_ok'] * ca / cb:.1f}s "
              f"(raw ratio {tb['total_ok'] / ta['total_ok']:.3f}, "
              f"normalized {tb['total_ok'] * ca / cb / ta['total_ok']:.3f})")
    if qa is None or qb is None:
        print("per-key map missing from one input "
              "(pre-r16 round files keep only the tail) — totals only")
        return
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = set(qa) - set(qb), set(qb) - set(qa)
    if only_a or only_b:
        print(f"keys only in A: {sorted(only_a)}")
        print(f"keys only in B: {sorted(only_b)}")
    fams = {}
    for k in shared:
        f = fams.setdefault(family(k), [0.0, 0.0, 0])
        f[0] += qa[k]
        f[1] += qb[k]
        f[2] += 1
    print(f"\n{'family':<16}{'n':>4}{'A sec':>10}{'B sec':>10}{'B/A':>8}")
    for name, (sa, sb, n) in sorted(fams.items(), key=lambda x: -x[1][0]):
        print(f"{name:<16}{n:>4}{sa:>10.2f}{sb:>10.2f}{sb / sa if sa else 0:>8.2f}")
    sa, sb = sum(qa[k] for k in shared), sum(qb[k] for k in shared)
    print(f"{'SHARED TOTAL':<16}{len(shared):>4}{sa:>10.2f}{sb:>10.2f}"
          f"{sb / sa if sa else 0:>8.2f}")
    deltas = sorted(shared, key=lambda k: qb[k] - qa[k])
    print(f"\ntop {top} regressions (B - A):")
    for k in deltas[-top:][::-1]:
        if qb[k] - qa[k] <= 0:
            break
        print(f"  {k:<34}{qa[k]:>8.2f} -> {qb[k]:>8.2f}  (+{qb[k] - qa[k]:.2f})")
    print(f"top {top} improvements (A - B):")
    for k in deltas[:top]:
        if qb[k] - qa[k] >= 0:
            break
        print(f"  {k:<34}{qa[k]:>8.2f} -> {qb[k]:>8.2f}  ({qb[k] - qa[k]:.2f})")


if __name__ == "__main__":
    main()
