#!/usr/bin/env python3
"""Static typing lint for the oracle corpus (VERDICT r9 ask #3).

DuckDB silently promotes sum(BIGINT) -> HUGEINT and DECIMAL arithmetic
widens; the driver's hash is TYPE-sensitive, so a value-equal HUGEINT
column still hash-mismatches a Spark BIGINT (the q_x_length_buckets
postmortem). This lint plans — never executes — every oracle SQL via
`DESCRIBE SELECT ...` against the testdata views and flags any result
column whose declared type Spark cannot produce: HUGEINT, UHUGEINT, or
an unexpected DECIMAL. Run it before registering any new oracle row:

    python3 tools/oracle_lint.py SF_DIR OUT_DIR   # OUT_DIR/oracle_sql.json

Exit 0 = clean; 1 = hits (each printed with column + type).
"""
import sys, json
from oracle_check import connect

# Types DuckDB can plan that Spark parquet output will never carry.
# DECIMAL is allowed ONLY when the Spark side also emits decimal — none
# of our queries do (we round to double or cast to bigint), so any
# DECIMAL in an oracle plan is a lint hit too.
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")

def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    hits = []
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            hits.append((name, "<plan>", f"DESCRIBE failed: {e}"))
            continue
        for cname, ctype, *_ in cols:
            if any(b in ctype.upper() for b in BAD):
                hits.append((name, cname, ctype))
    for name, cname, ctype in hits:
        print(f"HIT  {name}: column {cname} plans as {ctype} — "
              f"CAST it (driver hash is type-sensitive)")
    print(f"\n{len(oracle)} oracles linted, {len(hits)} typing hits")
    return 1 if hits else 0

if __name__ == "__main__":
    sys.exit(main())
