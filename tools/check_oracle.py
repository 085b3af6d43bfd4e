#!/usr/bin/env python3
"""Dev harness replicating the driver's t2 correctness gate: run each
oracle SQL in DuckDB over the sf parquet tables and compare with the
Spark result parquet written by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    """Sort columns by name, then rows by stringified values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"MISSING  {name}: no spark result dir")
            n_bad += 1
            continue
        try:
            s = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        sc, sr = normalize(s_rows, s_cols)
        oc, orw = normalize(o_rows, o_cols)
        if sc != oc:
            print(f"MISMATCH {name}: columns spark={sc} oracle={oc}")
            n_bad += 1
        elif sr != orw:
            n_bad += 1
            diff = [(a, b) for a, b in zip(sr, orw) if a != b][:3]
            extra_s = [r for r in sr if r not in set(orw)][:2]
            extra_o = [r for r in orw if r not in set(sr)][:2]
            print(f"MISMATCH {name}: rows spark={len(sr)} oracle={len(orw)}")
            for a, b in diff:
                print(f"    spark : {a}\n    oracle: {b}")
            if extra_s:
                print(f"    only-spark: {extra_s}")
            if extra_o:
                print(f"    only-oracle: {extra_o}")
        else:
            print(f"MATCH    {name} ({len(sr)} rows)")
            n_ok += 1
    print(f"== {n_ok} match, {n_bad} mismatch ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
