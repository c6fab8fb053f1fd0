#!/usr/bin/env python3
"""Execution-position drift analysis over bench artifacts (r16 task 1).

Usage: python3 tools/drift_analysis.py <ref.jsonl> <run.jsonl-or-stdout-log>...

For each run, prints the median per-key counted-seconds ratio vs the
reference, bucketed by the RUN's own execution-order decile. A slow
first-decile that decays to ~1.0 regardless of WHICH keys run first
(forward vs GRAFT_BENCH_REVERSE=1 sweeps) is the fingerprint of an
early-sweep environment/JIT phase rather than a per-key code regression.
"""
import json
import statistics
import sys


def load(path):
    q = c = o = None
    rev = False
    for ln in open(path, encoding="utf-8", errors="replace"):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        m = d.get("metric")
        if m == "queries":
            q = d["queries"]
        elif m == "cpu":
            c = d["cpu"]
        elif m == "retimed":
            o = d.get("order")
        elif m == "reversed":
            rev = True
        elif m == "total":
            t = d
    return q, c, o, rev, t


def main():
    ref_path = sys.argv[1]
    qr, _, _, _, tr = load(ref_path)
    print(f"reference: {ref_path} total_ok={tr['total_ok']}")
    for path in sys.argv[2:]:
        q, c, o, rev, t = load(path)
        ks = sorted(q, key=lambda k: o[k])
        n = len(ks)
        decs = []
        for d in range(10):
            seg = ks[d * n // 10:(d + 1) * n // 10]
            decs.append(round(statistics.median(
                q[k] / max(qr[k], 0.01) for k in seg), 2))
        label = "REVERSED" if rev else "forward"
        print(f"\n{path} ({label}) total_ok={t['total_ok']} "
              f"calib {t.get('calibration_sec')} -> "
              f"{t.get('calibration_end_sec', '-')}")
        print(f"  per-execution-decile median ratio vs ref: {decs}")
        # settled region = deciles 3-10: the code-attributed estimate
        settled = ks[2 * n // 10:]
        ratio = sum(q[k] for k in settled) / sum(qr[k] for k in settled)
        med = statistics.median(q[k] / max(qr[k], 0.01) for k in settled)
        print(f"  settled-region (deciles 3-10): sum ratio {ratio:.3f}, "
              f"median per-key ratio {med:.3f}")


if __name__ == "__main__":
    main()
