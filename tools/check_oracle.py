#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle correctness gate.

NOT part of the engine (the engine is Scala/Spark only). This script lets
the builder validate SparkEntry.oracleSql locally before the driver runs:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
It registers each testdata parquet as a DuckDB view, runs every oracle
SQL, and compares against the Spark-written parquet under outDir with
columns sorted by name and rows sorted by all columns.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes for compare: ints→int64, floats→float64,
    # timestamps→ns, lists→tuples
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[ns]")
        elif s.dtype == object:
            import datetime
            nonnull = s.dropna()
            if len(nonnull) and all(isinstance(v, datetime.date) and
                                    not isinstance(v, datetime.datetime)
                                    for v in nonnull.head(5)):
                # spark DATE → pandas object of datetime.date; duckdb
                # DATE → datetime64. Normalize both to datetime64[ns].
                s = pd.to_datetime(s)
            else:
                s = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); n_fail += 1
    # queries without oracles: rows-only check
    have = set(oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in have:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
            n_pass += n > 0; n_fail += n == 0
    # registered queries that errored before writing ANY output (e.g.
    # analysis failures) are recorded by Verify in errors.json — a
    # rows-only query with no dir would otherwise vanish silently
    seen = {d.rstrip("/").split("/")[-1]
            for d in glob.glob(f"{out_dir}/*/")}
    err_path = f"{out_dir}/errors.json"
    if os.path.exists(err_path):
        for name, msg in sorted(json.load(open(err_path)).items()):
            if name not in seen:
                print(f"FAIL {name}: verify error: {msg[:200]}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
