#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare values exactly.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if v is None:
        return "NULL"
    return str(v)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchall()
            expcols = sorted([d[0] for d in con.description])
            colidx = [
                [d[0] for d in con.description].index(c) for c in expcols]
            exp_rows = sorted(tuple(norm(r[i]) for i in colidx) for r in exp)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
            gotcols = sorted([d[0] for d in con.description])
            gidx = [
                [d[0] for d in con.description].index(c) for c in gotcols]
            got_rows = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            fail += 1
            continue
        if expcols != gotcols:
            print(f"FAIL {name}: columns differ: oracle={expcols} spark={gotcols}")
            fail += 1
        elif exp_rows != got_rows:
            diffs = [(a, b) for a, b in zip(exp_rows, got_rows) if a != b]
            print(f"FAIL {name}: {len(exp_rows)} vs {len(got_rows)} rows, "
                  f"first diffs: {diffs[:3]}"
                  if len(exp_rows) == len(got_rows) else
                  f"FAIL {name}: row count {len(exp_rows)} vs {len(got_rows)}; "
                  f"exp[0:2]={exp_rows[:2]} got[0:2]={got_rows[:2]}")
            fail += 1
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {len(oracles)} total")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
