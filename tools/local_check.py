#!/usr/bin/env python3
"""Local replica of the driver's correctness compare (verification aid,
not shipped code): reads Verify output dir, runs each oracle SQL in
DuckDB over the same sf parquet tables, and reports rows/schema/hash
match per query.  Usage: local_check.py <sfDir> <verifyOutDir> [names]"""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",") if len(sys.argv) > 3 else None

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(f"{v:.6g}")
            elif type(v).__name__ in ("date", "Timestamp", "datetime"):
                cells.append(str(pd.to_datetime(v)))
            elif isinstance(v, (list, tuple)) or "ndarray" in type(v).__name__:
                cells.append(str(list(v)))
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return (sorted(df.columns), len(rows),
            hashlib.md5("\n".join(rows).encode()).hexdigest())

todo = names or sorted(oracle.keys())
fails = 0
for name in todo:
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    spark_df = pd.read_parquet(f"{out_dir}/{name}")
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)"); continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    sc, sn, sh = canon(spark_df)
    oc, on, oh = canon(odf)
    ok = (sc == oc, sn == on, sh == oh)
    if all(ok):
        print(f"{name}: PASS ({sn} rows)")
    else:
        fails += 1
        print(f"{name}: FAIL cols={ok[0]} rows={ok[1]}({sn}/{on}) hash={ok[2]}")
        if not ok[0]:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
sys.exit(1 if fails else 0)
