#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + oracle_sql.json), then this script runs each
oracle SQL in DuckDB over the same fixture tables and compares rows/schema/
hash the way the driver does (columns sorted by name, values stringified).

Usage: python3 tools/check_correctness.py <sf_dir> <verify_out_dir>
"""
import sys, json, glob, os, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    t0 = time.time()
    spark_dir = f"{out_dir}/{name}"
    res = {"rows_match": False, "schema_match": False, "hash_match": False}
    try:
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            raise RuntimeError("no spark output")
        sdf = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
        odf = con.execute(sql).fetchdf()
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        res["rows_match"] = len(sdf) == len(odf)
        res["schema_match"] = list(sdf.columns) == list(odf.columns)
        sh = [tuple(str(v) for v in r) for r in sdf.itertuples(index=False)]
        oh = [tuple(str(v) for v in r) for r in odf.itertuples(index=False)]
        res["hash_match"] = sh == oh
        if not res["hash_match"] and sh and oh:
            diffs = [(a, b) for a, b in zip(sh, oh) if a != b][:3]
            res["first_diffs"] = diffs
        res["spark_rows"], res["oracle_rows"] = len(sdf), len(odf)
    except Exception as e:
        res["err"] = str(e).split("\n")[0][:300]
    ok = res.get("hash_match") and res.get("schema_match")
    if not ok:
        fail += 1
    res["secs"] = round(time.time() - t0, 2)
    print(("PASS " if ok else "FAIL "), name,
          json.dumps({k: v for k, v in res.items() if k != "first_diffs"}),
          flush=True)
    if "first_diffs" in res:
        for a, b in res["first_diffs"]:
            print("   spark:", a, "\n  oracle:", b)
sys.exit(1 if fail else 0)
