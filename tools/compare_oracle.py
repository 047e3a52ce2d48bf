import duckdb, json, glob, os, sys
sf = sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv)>2 else '/tmp/verify_sf0001'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(out)):
    p = os.path.join(out, name)
    if not os.path.isdir(p): continue
    spark_df = con.execute(f"SELECT * FROM read_parquet('{p}/*.parquet')").fetchdf()
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df)>0 else "EMPTY!")
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"; continue
    s = spark_df[sorted(spark_df.columns)]
    o = odf[sorted(odf.columns)]
    if sorted(s.columns) != sorted(o.columns):
        results[name] = f"SCHEMA MISMATCH spark={sorted(s.columns)} oracle={sorted(o.columns)}"; continue
    if len(s) != len(o):
        results[name] = f"ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}"; continue
    # normalize: sort rows by all cols, stringify
    import pandas as pd
    def norm(df):
        df = df.copy()
        for c in df.columns:
            df[c] = df[c].map(lambda v: str(v.tolist()) if hasattr(v,'tolist') and not isinstance(v,(int,float)) else str(v))
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    sn, on_ = norm(s), norm(o)
    if sn.equals(on_):
        results[name] = "MATCH"
    else:
        diff = (sn != on_)
        bad_cols = [c for c in sn.columns if diff[c].any()]
        i = diff.any(axis=1).idxmax()
        results[name] = f"VALUE MISMATCH cols={bad_cols} firstrow={i} spark={sn.loc[i,bad_cols].to_dict()} oracle={on_.loc[i,bad_cols].to_dict()}"
ok = sum(1 for v in results.values() if v=="MATCH" or v.startswith("rows-only") and "OK" in v)
for k,v in results.items(): print(f"{k}: {v[:300]}")
print(f"\n{ok}/{len(results)} OK")
