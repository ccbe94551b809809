#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for every query in
SparkEntry, compare the Verify parquet dump against the DuckDB oracle
(row count, sorted-by-name columns, exact cell equality).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
Run Verify first:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_oracle(con, sfdir, sql):
    for t in TABLES:
        # driver testdata ships single-file parquet; locally generated
        # fixtures (graft.tools.ScaleUp) are Spark directory-parquet —
        # glob the parts in that case so sf1 spot-gates can run too
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con.sql(sql).df()

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(name, spark_df, duck_df):
    issues = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"schema mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    if len(spark_df) != len(duck_df):
        issues.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    # The driver's hash gate is type-sensitive: a DuckDB HUGEINT (SUM of
    # BIGINT) arrives here as float64 while Spark emits int64 — pandas
    # value-equality would mask that, so flag dtype-kind drift explicitly.
    for c in a.columns:
        if a[c].dtype.kind != b[c].dtype.kind:
            issues.append(
                f"dtype kind mismatch col {c}: spark={a[c].dtype} duck={b[c].dtype}"
                " (cast the oracle, e.g. CAST(SUM(x) AS BIGINT))")
    if len(a) == len(b):
        n_bad = 0
        first = None
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if a[c].dtype.kind == 'f':
                neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            else:
                neq = av != bv
            if neq.any():
                n_bad += int(neq.sum())
                i = int(neq.argmax())
                if first is None:
                    first = f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
        if n_bad:
            issues.append(f"{n_bad} cell mismatches; first: {first}")
    return issues

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    fails = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            fails += 1
            continue
        try:
            duck_df = load_oracle(con, sfdir, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        issues = compare(name, spark_df, duck_df)
        if issues:
            fails += 1
            print(f"FAIL {name} ({len(spark_df)} rows): " + "; ".join(issues))
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
