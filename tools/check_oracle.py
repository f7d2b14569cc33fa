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


def tclass(t):
    """Driver-equivalent type class (pandas lens): int widths collapse to
    int64; HUGEINT exceeds int64 and lands in float64 with FLOAT/DOUBLE."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UBIGINT", "FLOAT", "DOUBLE"):
        return "float"
    return t


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
            rel = con.sql(sql)
            # rel.types are real logical types (BIGINT vs HUGEINT), unlike
            # the coarse DB-API description codes ('NUMBER' for everything)
            typemap = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            exp = rel.fetchall()
            expcols = sorted(rel.columns)
            colidx = [rel.columns.index(c) for c in expcols]
            exptypes = [typemap[c] for c in expcols]
            exp_rows = sorted(tuple(norm(r[i]) for i in colidx) for r in exp)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        try:
            rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            typemap = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            got = rel.fetchall()
            gotcols = sorted(rel.columns)
            gidx = [rel.columns.index(c) for c in gotcols]
            gottypes = [typemap[c] for c in gotcols]
            got_rows = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            fail += 1
            continue
        if expcols != gotcols:
            print(f"FAIL {name}: columns differ: oracle={expcols} spark={gotcols}")
            fail += 1
        elif [tclass(t) for t in exptypes] != [tclass(t) for t in gottypes]:
            # the driver's hash is type-CLASS-sensitive (q18 round-1 lesson):
            # it reads results through pandas, where every plain int width
            # collapses to int64 but HUGEINT becomes float64 — so
            # BIGINT==INTEGER and HUGEINT==DOUBLE pass, HUGEINT!=BIGINT fails
            mism = [(c, a, b) for c, a, b in zip(expcols, exptypes, gottypes)
                    if tclass(a) != tclass(b)]
            print(f"FAIL {name}: column type classes differ: {mism}")
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
