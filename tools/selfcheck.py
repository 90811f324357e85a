#!/usr/bin/env python3
"""Self-check mimicking the driver's t2 gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark-written parquet
(columns sorted by name, rows sorted, values compared cell-by-cell)."""
import sys, json, math, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_df()
        got = duckdb.connect().execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetch_df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(exp.columns)} vs {list(got.columns)}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(exp)} vs {len(got)}")
            fails += 1
            continue
        e = exp.sort_values(by=list(exp.columns), ignore_index=True)
        g = got.sort_values(by=list(got.columns), ignore_index=True)
        bad = None
        for c in e.columns:
            for i in range(len(e)):
                a, b = e[c][i], g[c][i]
                if a is None or (isinstance(a, float) and math.isnan(a)):
                    ok = b is None or (isinstance(b, float) and math.isnan(b))
                else:
                    ok = a == b
                if not ok:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]}: oracle={bad[2]!r} spark={bad[3]!r}")
            fails += 1
        else:
            print(f"ok   {name} ({len(e)} rows)")
    except Exception as ex:
        print(f"ERROR {name}: {ex}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
