#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
For each query dir in verify_out_dir: load Spark's parquet, run the
matching oracle SQL in DuckDB over views named after the testdata
tables, sort columns by name + rows, and compare values.
"""
import sys, json, math, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = 'NaN'
                else: v = round(v, 6)
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [c for c in sorted(cols)], out

def main(outdir, sfdir):
    oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    qdirs = [d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d))]
    for q in sorted(qdirs):
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        if q not in oracle:
            print(f"{q:28s} rows-only: {len(srows)} rows {'PASS' if len(srows)>0 else 'FAIL(empty)'}")
            n_pass += 1 if len(srows) > 0 else 0
            n_fail += 0 if len(srows) > 0 else 1
            continue
        try:
            orel = con.sql(oracle[q])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"{q:28s} ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"{q:28s} SCHEMA MISMATCH spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orr:
            print(f"{q:28s} VALUE MISMATCH ({len(sr)} vs {len(orr)} rows)")
            both = set(sr) & set(orr)
            only_s = [r for r in sr if r not in both][:3]
            only_o = [r for r in orr if r not in both][:3]
            print(f"   cols: {sc}")
            print(f"   spark-only: {only_s}")
            print(f"   oracle-only: {only_o}")
            n_fail += 1
        else:
            print(f"{q:28s} PASS ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
