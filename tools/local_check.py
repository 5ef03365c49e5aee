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

def kind(col):
    """Canonical type class per column — the driver's hash is
    representation-sensitive (e.g. DuckDB widens uncast sum() to HUGEINT,
    which pandas fetches as float64/object while Spark writes int64), so
    str()-canonicalizing values alone is blind to that failure class.
    Object columns are sniffed by first non-null value: Spark parquet
    via pandas yields datetime.date objects where DuckDB yields
    datetime64 — same logical type, different pandas container."""
    s = str(col.dtype)
    if "int" in s: return "int"
    if "float" in s or "double" in s: return "float"
    if "bool" in s: return "bool"
    if "datetime" in s: return "date"
    nn = col.dropna()
    if len(nn):
        v = nn.iloc[0]
        t = type(v).__name__
        if t in ("date", "Timestamp", "datetime"): return "date"
        if t in ("int", "int64"): return "int"
        if t in ("float", "float64", "Decimal"): return "float"
        if t == "bool": return "bool"
        if isinstance(v, (list, tuple)) or "ndarray" in t: return "list"
    return "obj"

def driver_sortable(df):
    """Replicate the driver's canonicalizer, which pandas-sort_values
    the RAW frame before hashing: sort_values builds a Categorical per
    column and CRASHES on unhashable cells (lists/ndarrays).  r15
    shipped two array-output queries that passed this script's
    stringify-then-sort canon but died driver-side with `err` — run the
    driver's sort first so that failure class fails locally too
    (SURVEY §7.5 #12: no array columns in graded output)."""
    try:
        df.sort_values(by=sorted(df.columns))
        return None
    except Exception as e:
        return f"{type(e).__name__}: {e}"

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    tsig = [kind(df[c]) if len(df) else "any" for c in df.columns]
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
            hashlib.md5("\n".join(rows).encode()).hexdigest(), tsig)

todo = names or sorted(oracle.keys())
fails = 0
report = {}  # per-query record, driver-shaped (VERDICT r20 #2)
for name in todo:
    rec = {"rows_match": False, "schema_match": False,
           "hash_match": False, "err": None}
    report[name] = rec
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"{name}: NO SPARK OUTPUT"); rec["err"] = "no spark output"
        fails += 1; continue
    spark_df = pd.read_parquet(f"{out_dir}/{name}")
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)")
        rec.update(rows_match=True, schema_match=True, hash_match=True,
                   err="rows-only (no oracle SQL)")
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); rec["err"] = f"oracle: {e}"
        fails += 1; continue
    err = driver_sortable(spark_df) or driver_sortable(odf)
    if err:
        print(f"{name}: DRIVER-SORT ERR (unsortable output — array "
              f"columns? §7.5 #12): {err}")
        rec["err"] = f"driver-sort: {err}"
        fails += 1; continue
    sc, sn, sh, st = canon(spark_df)
    oc, on, oh, ot = canon(odf)
    ok = (sc == oc, sn == on, sh == oh, st == ot)
    rec.update(rows_match=bool(ok[1]), schema_match=bool(ok[0] and ok[3]),
               hash_match=bool(ok[2]))
    if all(ok):
        print(f"{name}: PASS ({sn} rows)")
    else:
        fails += 1
        print(f"{name}: FAIL cols={ok[0]} rows={ok[1]}({sn}/{on}) "
              f"hash={ok[2]} types={ok[3]}")
        if not ok[0]:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
        if not ok[3]:
            print(f"  spark types: {st}\n  oracle types: {ot}")
import os
if os.environ.get("LOCAL_CHECK_JSON"):
    # Self-committed correctness artifact (VERDICT r20 #2: the driver's
    # CORRECTNESS file came back empty twice — r08, r20 — leaving those
    # rounds formally ungraded; the builder now commits its own sweep).
    with open(os.environ["LOCAL_CHECK_JSON"], "w") as f:
        json.dump({"sf": sf_dir, "n": len(report),
                   "fails": fails, "queries": report}, f, indent=0)
sys.exit(1 if fails else 0)
