#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify output.

Mimics the driver's DuckDB compare: register each testdata parquet as a
view named after the table, run the oracle SQL, load the Spark result
parquet, sort columns by name, sort rows by all columns, and compare
values (hash after normalization). Usage:

    python3 tools/oracle_check.py SF_DIR OUT_DIR [options]

Options (all optional; defaults reproduce the original single-process
sweep):
    --timeout N     per-query wall budget in seconds; each oracle runs in
                    its own subprocess so a DuckDB plan that is hours-scale
                    at a big SF (e.g. the minhash-family LSH SQL at sf1)
                    yields a TIMEOUT row instead of wedging the sweep
    --only a,b,c    check only these queries
    --skip a,b,c    skip these queries (recorded as SKIPPED)
    --json PATH     also write {name: {status, detail, secs}} incrementally
                    after every query, so progress survives a killed run
"""
import sys, json, glob, os, time, argparse, subprocess
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

def connect(sf_dir):
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
    return con

def check_one(con, name, sql, out_dir):
    """Returns (status, detail) for one query; status OK/MISSING/ERROR/
    SCHEMA/ROWS/VALUES."""
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        return "MISSING", "no spark output"
    try:
        got = normalize(pd.concat([pd.read_parquet(f) for f in spark_files]))
        want = normalize(con.execute(sql).df())
    except Exception as e:
        return "ERROR", str(e)
    if list(got.columns) != list(want.columns):
        return "SCHEMA", f"spark={list(got.columns)} duckdb={list(want.columns)}"
    if len(got) != len(want):
        return "ROWS", f"spark={len(got)} duckdb={len(want)}"
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
            return "VALUES", f"col={c} spark={g[idx]!r} duckdb={w[idx]!r}"
    return "OK", f"{len(got)} rows"

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=float, default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)  # internal
    args = ap.parse_args()

    oracle = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    if args.one is not None:
        # child mode: one query, exit code encodes pass/fail
        con = connect(args.sf_dir)
        status, detail = check_one(con, args.one, oracle[args.one], args.out_dir)
        print(f"{status} {detail}", flush=True)
        return 0 if status == "OK" else 1

    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    results = {}
    def bank(name, status, detail, secs):
        results[name] = {"status": status, "detail": detail,
                         "secs": round(secs, 2)}
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)

    con = None if args.timeout else connect(args.sf_dir)
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in skip:
            print(f"SKIPPED  {name}", flush=True)
            bank(name, "SKIPPED", "excluded via --skip", 0.0)
            n_skip += 1
            continue
        t0 = time.time()
        if args.timeout:
            # subprocess isolation: DuckDB has no reliable mid-query
            # interrupt, so a fresh process per query is the only way to
            # enforce a wall budget without leaking a runaway plan
            cmd = [sys.executable, os.path.abspath(__file__),
                   args.sf_dir, args.out_dir, "--one", name]
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.timeout)
                out = (p.stdout or "").strip() or "ERROR empty child output"
                status, _, detail = out.partition(" ")
            except subprocess.TimeoutExpired:
                status, detail = "TIMEOUT", f"oracle exceeded {args.timeout:.0f}s"
        else:
            status, detail = check_one(con, name, sql, args.out_dir)
        secs = time.time() - t0
        print(f"{status:8s} {name}: {detail} [{secs:.1f}s]", flush=True)
        bank(name, status, detail, secs)
        if status == "OK":
            n_pass += 1
        else:
            n_fail += 1
    # skipped rows are counted in the summary so an all-skipped sweep
    # can't read as a clean "0 passed, 0 failed" gate
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} skipped", flush=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
