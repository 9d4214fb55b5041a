import duckdb, json, glob, os, sys
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracles = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracles.items()):
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        results[name] = "NO_RESULT"; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))], ignore_index=True)
        oracle_df = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(s.columns) != list(o.columns):
        results[name] = f"COLS spark={list(s.columns)} oracle={list(o.columns)}"; continue
    if len(s) != len(o):
        results[name] = f"ROWS spark={len(s)} oracle={len(o)}"; continue
    # normalize values to strings for comparison
    def norm(df):
        return df.astype(str).reset_index(drop=True)
    sn, on = norm(s), norm(o)
    if sn.equals(on):
        results[name] = "OK"
    else:
        diff = (sn != on)
        ncell = int(diff.values.sum())
        # find first differing cell
        idx = list(zip(*diff.values.nonzero()))[:3]
        samples = [f"row{r} col {sn.columns[c]}: spark={sn.iat[r,c]!r} oracle={on.iat[r,c]!r}" for r,c in idx]
        results[name] = f"DIFF {ncell} cells; " + " | ".join(samples)
ok = sum(1 for v in results.values() if v == "OK")
for k, v in sorted(results.items()):
    print(("PASS " if v=="OK" else "FAIL ") + k + ("" if v=="OK" else "  -> " + v))
print(f"\n{ok}/{len(results)} OK")
