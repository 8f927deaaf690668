#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json OUT.json]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every
testdata table registered as a view over <sfDir>/<table>.parquet, and diffs:
row count, column names (sorted), and per-cell values with rows sorted.

With --json, also writes a durable per-query artifact:
  {"queries": {name: {"rows": bool, "schema": bool, "cells": bool,
                      "secs": float[, "err": str]}},
   "ok": bool, "n": int, "n_fail": int, "total_secs": float,
   "max_query_secs": float, "slowest": [[name, secs] x10]}
so a green gate run is always on record with its oracle-side cost profile.

Exit 0 iff every query matches.
"""
import decimal
import json
import math
import sys
import time
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    # DuckDB HUGEINT (e.g. SUM over BIGINT) arrives as decimal128 via arrow;
    # Decimal(5) == 5 in Python, which would hide the type divergence the
    # driver's hash compare trips on. Tag it so it never silently matches.
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):  # datetime/date; normalize tz-naive
        try:
            v = v.replace(tzinfo=None)
        except (TypeError, ValueError):
            pass
        return v.isoformat()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def sort_key(row):
    # Tolerance-stable sort: round floats to 9 significant digits in the
    # KEY ONLY so sub-1e-9 jitter can't reorder one side and misalign the
    # positional compare (values themselves stay exact).
    return repr(tuple(
        float(f"{v:.9g}") if isinstance(v, float) and not math.isnan(v) else v
        for v in row))


def rows_of(names, cols):
    order = sorted(range(len(names)), key=lambda i: names[i])
    arrs = [cols[i] for i in order]
    return sorted(
        (tuple(canon(a[r]) for a in arrs) for r in range(len(arrs[0]) if arrs else 0)),
        key=sort_key), [names[i] for i in order]


def float_close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = []

    def nested_cols(schema):
        # The driver's pandas-based compare sorts/hashes cell values;
        # list/struct/map cells arrive as numpy arrays / dicts and raise
        # "unhashable type" THERE even though we could canonicalize them
        # HERE. Mirror the driver's limitation: nested-typed result
        # columns are a hard failure, not something to paper over.
        import pyarrow.types as pt
        return [f.name for f in schema
                if pt.is_nested(f.type) or pt.is_dictionary(f.type)]

    report = {}
    t_all = time.monotonic()

    def check_one(name, rec):
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            failures.append((name, "spark output missing"))
            return
        tbl = pq.read_table(spark_dir)
        bad_cols = nested_cols(tbl.schema)
        if bad_cols:
            failures.append((name, "array/struct result columns "
                             f"{bad_cols} — driver compare cannot hash "
                             "these; flatten to scalars or drop oracleSql"))
            return
        s_rows, s_names = rows_of(
            tbl.column_names, [c.to_pylist() for c in tbl.columns])
        try:
            # Fetch via arrow — the driver compares on the arrow path, and
            # arrow surfaces type divergences (HUGEINT -> decimal128) that
            # fetchall() hides behind native Python ints.
            d_tbl = con.execute(oracle[name]).arrow()
            d_bad = nested_cols(d_tbl.schema)
            if d_bad:
                failures.append((name, "array/struct ORACLE result columns "
                                 f"{d_bad} — driver compare cannot hash"))
                return
            d_rows, d_names = rows_of(
                d_tbl.column_names, [c.to_pylist() for c in d_tbl.columns])
        except Exception as e:
            rec["err"] = str(e)[:300]
            failures.append((name, f"duckdb error: {e}"))
            return
        if s_names != d_names:
            failures.append((name, f"columns differ: spark={s_names} duck={d_names}"))
            return
        rec["schema"] = True
        if len(s_rows) != len(d_rows):
            failures.append((name, f"row count: spark={len(s_rows)} duck={len(d_rows)}"))
            return
        rec["rows"] = True
        n_bad = exact_bad = 0
        first = None
        for sr, dr in zip(s_rows, d_rows):
            if sr != dr:
                exact_bad += 1
                if not all(float_close(a, b) for a, b in zip(sr, dr)):
                    n_bad += 1
                    if first is None:
                        first = (sr, dr)
        if n_bad:
            failures.append((name, f"{n_bad} rows differ; first: spark={first[0]} duck={first[1]}"))
            return
        rec["cells"] = True
        if exact_bad:
            print(f"~  {name}: EXACT-MISMATCH on {exact_bad} rows but within 1e-9 "
                  "(float low bits — driver hash compare may still fail!)")
        else:
            print(f"OK {name}: {len(s_rows)} rows")

    for name in sorted(oracle):
        rec = {"rows": False, "schema": False, "cells": False, "secs": 0.0}
        report[name] = rec
        t0 = time.monotonic()
        try:
            check_one(name, rec)
        finally:
            rec["secs"] = round(time.monotonic() - t0, 3)
        sys.stdout.flush()
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    slowest = sorted(report.items(), key=lambda kv: -kv[1]["secs"])[:10]
    print("slowest oracle queries: "
          + ", ".join(f"{n}={r['secs']:.1f}s" for n, r in slowest))
    if json_out:
        total = round(time.monotonic() - t_all, 3)
        Path(json_out).write_text(json.dumps({
            "queries": report,
            "ok": not failures,
            "n": len(report),
            "n_fail": len(failures),
            "total_secs": total,
            "max_query_secs": max((r["secs"] for r in report.values()),
                                  default=0.0),
            "slowest": [[n, r["secs"]] for n, r in slowest],
        }, indent=1, sort_keys=True))
        print(f"wrote {json_out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
