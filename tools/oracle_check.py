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
from datetime import date
from decimal import Decimal
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
        elif s.dtype == object:
            # DuckDB HUGEINT (sum(BIGINT) promotes!) and DECIMAL arrive as
            # object dtype: int or decimal.Decimal python objects. The
            # driver's hash is TYPE-sensitive, so a value-equal HUGEINT
            # column still fails there. Surface that here: try to coerce
            # integral object columns to Int64; if any value overflows
            # int64 or is a non-integral Decimal, leave a loud marker
            # dtype instead of silently comparing value-equal.
            nn = s.dropna()
            if len(nn) and all(
                    isinstance(v, int) or
                    (isinstance(v, Decimal) and v == v.to_integral_value())
                    for v in nn):
                try:
                    df[c] = s.map(lambda v: v if v is None or
                                  (isinstance(v, float) and pd.isna(v))
                                  else int(v)).astype("Int64")
                except (OverflowError, TypeError):
                    pass  # keep object; dtype gate below will flag it
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

def raw_kind(s: pd.Series) -> str:
    """Driver-visible type class of a column BEFORE normalization. The
    driver's hash is type-sensitive, so a DuckDB HUGEINT (object dtype of
    python ints — what sum(BIGINT) silently promotes to) vs a Spark BIGINT
    is a driver failure even when every value matches."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object:
        nn = s.dropna()
        if len(nn) and all(isinstance(v, int) and not isinstance(v, bool)
                           for v in nn):
            return "hugeint"
        if len(nn) and all(isinstance(v, Decimal) for v in nn):
            return "decimal"
        # Spark DATE columns arrive from pandas read_parquet as object
        # dtype of datetime.date while DuckDB DATE arrives as
        # datetime64 — the driver hashes these equal (both r09 DATE
        # rows were green), so they are one kind here
        if len(nn) and all(isinstance(v, date) for v in nn):
            return "ts"
    return "other"

def check_one(con, name, sql, out_dir):
    """Returns (status, detail) for one query; status OK/MISSING/ERROR/
    SCHEMA/ROWS/DTYPE/VALUES."""
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        return "MISSING", "no spark output"
    try:
        got_raw = pd.concat([pd.read_parquet(f) for f in spark_files])
        want_raw = con.execute(sql).df()
        got, want = normalize(got_raw), normalize(want_raw)
    except Exception as e:
        return "ERROR", str(e)
    if list(got.columns) != list(want.columns):
        return "SCHEMA", f"spark={list(got.columns)} duckdb={list(want.columns)}"
    # dtype gate: mirror the driver's type-sensitive hash. HUGEINT/DECIMAL
    # vs BIGINT is a driver fail even if values are equal — flag it here
    # so the local pre-check can never pass what the driver fails.
    for c in got.columns:
        gk, wk = raw_kind(got_raw[c]), raw_kind(want_raw[c])
        if gk != wk and not (len(got_raw[c].dropna()) == 0 or
                             len(want_raw[c].dropna()) == 0):
            return "DTYPE", (f"col={c} spark={gk} duckdb={wk} — un-CAST "
                             f"aggregate in the oracle SQL? (DuckDB "
                             f"sum(BIGINT)->HUGEINT)")
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
    # can't read as a clean "0 passed, 0 failed" gate — and a sweep that
    # verified NOTHING (all skipped / filtered to zero) exits non-zero.
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} skipped", flush=True)
    return 1 if (n_fail or n_pass == 0) else 0

if __name__ == "__main__":
    sys.exit(main())
