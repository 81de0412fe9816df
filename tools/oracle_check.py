#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: reads the
Verify.scala output dir (per-query parquet + oracle_sql.json), runs each
oracle in DuckDB against the fixture tables, sorts columns by name, and
compares row counts / dtypes / values. Not part of the engine."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    spark_df = spark_df[sorted(spark_df.columns)]
    ora_df = ora_df[sorted(ora_df.columns)]
    ok = True
    if list(spark_df.columns) != list(ora_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(ora_df.columns)}")
        ok = False
    elif len(spark_df) != len(ora_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(ora_df)}")
        ok = False
    else:
        if [str(d) for d in spark_df.dtypes] != [str(d) for d in ora_df.dtypes]:
            print(f"WARN {name}: dtypes {list(spark_df.dtypes)} vs {list(ora_df.dtypes)}")
        def neq(x, y):
            # NaN == NaN here: the driver's hash compare stringifies values,
            # so two NaNs (or two NULLs) on matching rows are equal
            if x != x and y != y:
                return False
            return x != y
        diff_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c].tolist(), ora_df[c].tolist()
            bad = next((i for i in range(len(a)) if neq(a[i], b[i])), None)
            if bad is not None:
                diff_cols.append((c, bad, a[bad], b[bad]))
        if diff_cols:
            c, i, x, y = diff_cols[0]
            print(f"FAIL {name}: value diff col={c} row={i} spark={x!r} oracle={y!r} ({len(diff_cols)} cols differ)")
            ok = False
    if ok:
        print(f"PASS {name} ({len(spark_df)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
