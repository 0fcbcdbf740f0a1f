#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load the Spark parquet result, run the oracle SQL in DuckDB
with the testdata tables registered as views, sort columns by name, compare
row-by-row (exact for non-floats; exact for floats too, since the engine's
Num policy makes doubles bit-identical — report max abs diff when not).

This tool is local pre-verification only; it is not part of the library.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                import pandas as pd
                if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                    import numpy as np
                    a = sv.astype(float).to_numpy()
                    b = dv.astype(float).to_numpy()
                    eq = (a == b) | (np.isnan(a) & np.isnan(b))
                    if not eq.all():
                        i = int(np.argmin(eq))
                        bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i} {a[i]!r}!={b[i]!r}, maxdiff={np.nanmax(np.abs(a-b))}")
                else:
                    if not sv.astype(str).equals(dv.astype(str)):
                        neq = sv.astype(str) != dv.astype(str)
                        i = int(neq.idxmax())
                        bad.append(f"{c}: {int(neq.sum())} diffs, first@{i} {sv[i]!r}!={dv[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
