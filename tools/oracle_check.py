#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify output.

Mimics the driver's DuckDB compare: register each testdata parquet as a
view named after the table, run the oracle SQL, load the Spark result
parquet, sort columns by name, sort rows by all columns, and compare
values (hash after normalization). Usage:

    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes: ints -> int64 (nullable), floats -> float64,
    # timestamps -> ns, bools kept
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        # driver testdata tables are single files; generated scale dirs
        # (ScaleSmokeMain gensf) are parquet DIRECTORIES of part files
        src = f"read_parquet('{f}')" if os.path.isfile(f) \
            else f"read_parquet('{f}/*.parquet')"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
        if name == "events":
            # scaled events keep ts as raw int64 nanos (so Spark reads it
            # through the same Sources.table nanos path as the original);
            # rebuild the view with TIMESTAMP_NS to match the sf* files
            cols = {r[0]: r[1] for r in
                    con.execute("DESCRIBE events").fetchall()}
            if cols.get("ts") == "BIGINT":
                con.execute("DROP VIEW events")
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp_ns(ts) AS ts) FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} duckdb={len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
                eq = (g.astype("float64").fillna(np.nan)).combine(
                    w.astype("float64").fillna(np.nan),
                    lambda a, b: (np.isnan(a) and np.isnan(b)) or a == b)
            else:
                eq = (g.isna() & w.isna()) | (g == w)
            if not bool(eq.all()):
                idx = (~eq).idxmax()
                bad = (c, g[idx], w[idx])
                break
        if bad:
            c, gv, wv = bad
            print(f"VALUES   {name}: col={c} spark={gv!r} duckdb={wv!r}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
