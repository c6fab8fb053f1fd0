#!/usr/bin/env python3
"""One-off sf0.1 oracle attestation (VERDICT r15 task 3).

Usage: python3 tools/sf01_attest.py <sfDir> <verifyOutDir> [perKeyTimeoutSec]

Wraps tools/oracle_check.py one key at a time in a subprocess with a
wall-clock budget (default 120 s): the engine's oracles are written for
DuckDB at sf0.01, and a handful are DELIBERATELY oracle-scale-only
strategies (e.g. graph_bfs's recursive path-enumeration CTE is O(paths)
BY DESIGN — the point of the key is that the engine's frontier join is
the scalable form). At sf0.1 those oracles may be computationally
infeasible; a timeout is recorded as `oracle-timeout` (an adjudicated
exception, NOT a failure) so the attestation separates "oracle can't
keep up at 10x" from "engine diverges at 10x" — only the latter is a
quantization bug.

Writes <verifyOutDir>/ATTEST_SF01.json: {key: "pass" | "fail: ..." |
"oracle-timeout" | "no-oracle"} plus a summary line, exit 1 only on real
failures. Extra args after the timeout are a key filter: only those keys
are (re-)checked and their rows are MERGED into an existing
ATTEST_SF01.json — the retry path for oracle-timeout keys at a larger
budget.
"""
import json
import os
import subprocess
import sys


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    only = set(sys.argv[4:])
    with open(f"{outdir}/oracle_sql.json", encoding="utf-8") as f:
        oracle = json.load(f)
    produced = {d for d in os.listdir(outdir)
                if os.path.isdir(os.path.join(outdir, d))}
    if only:
        produced &= only
    results = {}
    attest_path = f"{outdir}/ATTEST_SF01.json"
    if only and os.path.exists(attest_path):
        with open(attest_path, encoding="utf-8") as f:
            results = json.load(f).get("results", {})
    here = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(produced):
        if name not in oracle:
            results[name] = "no-oracle"
            continue
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "oracle_check.py"),
                 sfdir, outdir, name],
                capture_output=True, text=True, timeout=budget)
            out = p.stdout + p.stderr
            if p.returncode == 0 and f"ok   {name}" in out:
                results[name] = "pass"
            else:
                line = next((ln for ln in out.splitlines()
                             if ln.startswith("FAIL")), out.strip()[:200])
                results[name] = f"fail: {line[:300]}"
        except subprocess.TimeoutExpired:
            results[name] = "oracle-timeout"
        print(f"{results[name][:60]:<60} {name}", flush=True)
    n_pass = sum(1 for v in results.values() if v == "pass")
    n_to = sum(1 for v in results.values() if v == "oracle-timeout")
    n_no = sum(1 for v in results.values() if v == "no-oracle")
    fails = {k: v for k, v in results.items() if v.startswith("fail")}
    summary = {
        "sf_dir": sfdir, "per_key_timeout_sec": budget,
        "retried_keys": sorted(only),
        "n_keys": len(results), "n_pass": n_pass,
        "n_oracle_timeout": n_to, "n_no_oracle": n_no,
        "n_fail": len(fails), "failures": fails, "results": results,
    }
    with open(f"{outdir}/ATTEST_SF01.json", "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"== sf0.1 attest: {n_pass} pass, {len(fails)} fail, "
          f"{n_to} oracle-timeout, {n_no} no-oracle over {len(results)} ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
