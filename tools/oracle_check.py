#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over <sfDir>/*.parquet views, sorts columns
by name, and compares values (exact for ints/strings/timestamps, 1e-9 for
floats). Mirrors SURVEY.md §5.1.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            # decimals from duckdb -> float
            if len(s) and any(type(v).__name__ == "Decimal" for v in s.dropna().head(5)):
                s = s.astype("float64")
        elif np.issubdtype(s.dtype, np.integer):
            s = s.astype("int64")
        elif np.issubdtype(s.dtype, np.floating):
            s = s.astype("float64")
        out[c] = s
    return pd.DataFrame(out)


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def tclass(t: str) -> str:
    """Collapse a declared DuckDB type to the VALUE CLASS the driver's
    pandas-level hash actually sees. Calibrated against CORRECTNESS_r05:
    integer-width drift (rank() BIGINT vs Spark INTEGER, TINYINT popcount)
    and DECIMAL-vs-DOUBLE were all driver-GREEN (same pandas repr), while
    HUGEINT (pandas float64 against Spark's int64) was the entire round-5
    failure set. So: widths collapse, float-ish collapses, HUGEINT is its
    own always-fatal class."""
    b = t.split("(")[0]
    if b in INT_TYPES:
        return "int"
    if b in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if b in ("DOUBLE", "FLOAT", "REAL", "DECIMAL"):
        return "float"
    return b


def type_check(spark_types: dict, oracle_types: dict) -> str:
    """Declared-type class compare, mirroring the driver's exact hash.

    Both sides are DuckDB logical types (the Spark parquet is read back
    through read_parquet). The round-1 AND round-5 blind spot: DuckDB
    widens integer sum()/count_if/windowed sum to HUGEINT; pandas then
    surfaces it as float64, norm() coerced both sides and isclose passed —
    while the driver's hash saw 5 vs 5.0. Fail here, before values.
    """
    for c in sorted(set(spark_types) & set(oracle_types)):
        st, ot = spark_types[c], oracle_types[c]
        sc, oc = tclass(st), tclass(ot)
        if sc == oc:
            continue
        if "hugeint" in (sc, oc):
            side = "oracle" if oc == "hugeint" else "spark"
            return (f"ORACLE-TYPE col={c}: {side} side is HUGEINT "
                    f"(spark={st} oracle={ot}); CAST it AS BIGINT")
        return (f"ORACLE-TYPE col={c}: value-class mismatch spark={st} "
                f"oracle={ot}; CAST one side to match")
    return ""


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    # The driver compares schemas strictly: a tz-aware Spark timestamp vs
    # DuckDB's naive TIMESTAMP is a schema mismatch even when the instants
    # agree (the round-1 blind spot). Flag before norm() hides it.
    for c in got.columns:
        if getattr(got[c].dtype, "tz", None) is not None:
            return f"SCHEMA col={c} is tz-aware ({got[c].dtype}); cast to timestamp_ntz"
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        return f"COLUMNS spark={list(got.columns)} oracle={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            g = g.astype("float64")
            e = e.astype("float64")
            bad = ~(np.isclose(g, e, rtol=1e-9, atol=1e-9, equal_nan=True) |
                    (g.isna() & e.isna()))
        else:
            bad = ~((g == e) | (g.isna() & e.isna()))
        if bad.any():
            i = int(np.argmax(bad.values))
            return (f"VALUE col={c} row={i} spark={got[c].iloc[i]!r} "
                    f"oracle={exp[c].iloc[i]!r}")
    return ""


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # ORACLE_TMP: spill directory for DuckDB temp storage. The sf0.1
    # attestation's recursive-CTE replays (graph_kcore's peel) spill
    # O(rounds x edges) — more than the root disk's headroom but fine on
    # the 122G tmpfs; the sf0.01 driver runs never spill and ignore this.
    tmp = os.environ.get("ORACLE_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = set(sys.argv[3:])
    ok = fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: missing spark output")
            fail += 1
            continue
        grel = con.sql(f"SELECT * FROM read_parquet('{files[0]}')")
        got = grel.fetchdf()
        try:
            erel = con.sql(oracle[name])
            exp = erel.fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle sql error: {str(e).splitlines()[0]}")
            fail += 1
            continue
        msg = type_check(
            dict(zip(grel.columns, (str(t) for t in grel.types))),
            dict(zip(erel.columns, (str(t) for t in erel.types)))
        ) or compare(name, got, exp)
        if msg:
            print(f"FAIL {name}: {msg}")
            fail += 1
        else:
            ok += 1
            print(f"ok   {name} ({len(got)} rows)")
    print(f"== {ok} ok, {fail} fail ==")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
