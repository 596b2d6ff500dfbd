#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
For each query dir in verify_out_dir: load Spark's parquet, run the
matching oracle SQL in DuckDB over views named after the testdata
tables, sort columns by name + rows, and compare values.

Emulates the driver's *pandas* harness: both sides go through
DuckDB .df(), dtype KINDS must match (catches e.g. HUGEINT sums that
land as float64 against Spark's int64), and list/array/Decimal cells
are rejected outright (pandas can't hash them — emit JSON strings).

NOTE: canon_df deliberately maps BOTH None and float NaN to 'NULL'.
This matches the pandas harness it emulates: a nullable float column
round-trips SQL NULL as np.nan, so after .df() the two are already
indistinguishable on either side — keeping them distinct here would
flag mismatches the driver can never see. The cost: a genuine
NaN-vs-NULL divergence between engines is invisible to this checker
(guard such cases in ScalaTest specs instead).
"""
import sys, json, math, os
import duckdb
import numpy as np

UNHASHABLE = (list, dict, set, bytearray, np.ndarray)

def canon_df(df):
    """Sort columns by name; return (cols, dtype_kinds, sorted row tuples,
    unhashable-column set)."""
    cols = sorted(df.columns)
    df = df[cols]
    kinds = [df[c].dtype.kind for c in cols]
    bad = set()
    rows = []
    for r in df.itertuples(index=False, name=None):
        rr = []
        for i, v in enumerate(r):
            if isinstance(v, UNHASHABLE):
                bad.add(cols[i])
                v = repr(v)
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                v = 'NULL'
            elif isinstance(v, float):
                v = repr(round(v, 6))
            else:
                v = repr(v)
            rr.append(v)
        rows.append(tuple(rr))
    rows.sort()
    return cols, kinds, rows, bad

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
        sdf = con.sql(f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')").df()
        sc, sk, sr, sbad = canon_df(sdf)
        if q not in oracle:
            ok = len(sr) > 0 and not sbad
            note = f"rows-only: {len(sr)} rows"
            if sbad: note += f" UNHASHABLE cols {sorted(sbad)}"
            print(f"{q:28s} {note} {'PASS' if ok else 'FAIL'}")
            n_pass += 1 if ok else 0
            n_fail += 0 if ok else 1
            continue
        try:
            odf = con.sql(oracle[q]).df()
        except Exception as e:
            print(f"{q:28s} ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        oc, ok_, orr, obad = canon_df(odf)
        if sbad or obad:
            print(f"{q:28s} UNHASHABLE cells: spark={sorted(sbad)} oracle={sorted(obad)}"
                  " (pandas harness cannot hash lists — emit JSON strings)")
            n_fail += 1
        elif sc != oc:
            print(f"{q:28s} SCHEMA MISMATCH spark={sc} oracle={oc}")
            n_fail += 1
        elif sk != ok_:
            print(f"{q:28s} DTYPE MISMATCH cols={sc} spark={sk} oracle={ok_}"
                  " (e.g. DuckDB HUGEINT sum → float64; CAST the oracle)")
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
