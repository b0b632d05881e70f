#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--only name1,name2] [--skip-verify]

1. Runs graft.Verify on sfDir -> outDir (spark parquet per query + oracle_sql.json)
2. Registers the same parquet tables in DuckDB, runs each oracle SQL
3. Compares: row count, column names (sorted), values (exact, row order kept)
"""
import sys, os, json, subprocess, glob

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify(sf_dir, out_dir, only):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    if only:
        env["SPARK_GRAFT_ONLY"] = ",".join(only)
    r = subprocess.run(["tools/run_verify.sh", "graft.Verify", sf_dir, out_dir],
                       env=env)
    if r.returncode != 0:
        print("Verify FAILED", file=sys.stderr)
        sys.exit(1)


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def cmp_frames(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    # dtype parity: a dtype-sensitive hasher (int32 vs int64, datetime
    # resolutions, hugeint->float64) can fail equal values — keep widths
    # aligned in the queries rather than papering over it here
    for c in spark_df.columns:
        a, b = str(spark_df[c].dtype), str(duck_df[c].dtype)
        if a != b:
            problems.append(f"dtype {c}: spark={a} duck={b}")
    s, d = norm(spark_df), norm(duck_df)
    n = min(len(s), len(d))
    for c in s.columns:
        a, b = s[c].iloc[:n], d[c].iloc[:n]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av, bv = a.astype(float).values, b.astype(float).values
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    i = int(np.argmin(eq))
                    problems.append(f"col {c}: {int((~eq).sum())} diffs, first@{i}: spark={av[i]!r} duck={bv[i]!r} maxdiff={np.nanmax(np.abs(av-bv))}")
            else:
                av = a.apply(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
                bv = b.apply(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
                eq = (av.values == bv.values)
                if not np.all(eq):
                    i = int(np.argmin(eq))
                    problems.append(f"col {c}: {int((~np.asarray(eq)).sum())} diffs, first@{i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
        except Exception as e:
            problems.append(f"col {c}: compare error {e}")
    return problems


def main():
    args = [a for a in sys.argv[1:]]
    only = None
    skip_verify = False
    if "--skip-verify" in args:
        skip_verify = True; args.remove("--skip-verify")
    if "--only" in args:
        i = args.index("--only"); only = args[i+1].split(","); del args[i:i+2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_check"
    if not skip_verify:
        run_verify(sf_dir, out_dir, only)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = only or sorted(set(list(oracle.keys()) +
                               [os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)]))
    n_pass = n_fail = n_nooracle = 0
    for name in names:
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"✗ {name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"○ {name}: no oracle ({len(spark_df)} rows)")
            n_nooracle += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        probs = cmp_frames(name, spark_df, duck_df)
        if probs:
            print(f"✗ {name}: " + "; ".join(probs[:4]))
            n_fail += 1
        else:
            print(f"✓ {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nooracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
