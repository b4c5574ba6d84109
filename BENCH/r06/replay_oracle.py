#!/usr/bin/env python3
"""Replay the driver's DuckDB oracle compare over a graft.Verify output dir.
Usage: python3 replay_oracle.py <sfdir> <verify_out>"""
import duckdb, json, glob, os, sys
import pyarrow.parquet as pq
import numpy as np
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0; n = 0
for name in sorted(os.listdir(out)):
    if not os.path.isdir(f'{out}/{name}'): continue
    got = pq.read_table(glob.glob(f'{out}/{name}/*.parquet')[0]).to_pandas()
    if name not in oracle:
        print(f"{name}: rows={len(got)} (no oracle)"); continue
    try: exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERR {str(e)[:150]}"); fails += 1; continue
    g = got[sorted(got.columns)]; e = exp[sorted(exp.columns)]
    n += 1
    if len(g) != len(e):
        print(f"{name}: ROWS {len(g)} vs {len(e)}"); fails += 1; continue
    ok = True
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'M' or ev.dtype.kind == 'M':
            gv = pd.to_datetime(gv).astype('datetime64[us]')
            ev = pd.to_datetime(ev).astype('datetime64[us]')
            if not (gv.values == ev.values).all(): ok = False
        elif gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            if not np.allclose(gv.values.astype(float), ev.values.astype(float),
                               rtol=0, atol=1e-12, equal_nan=True): ok = False
        else:
            if not (gv.values.astype(str) == ev.values.astype(str)).all(): ok = False
        if not ok:
            print(f"{name}: MISMATCH col {c}"); fails += 1; break
print(f"checked {n}, FAILS: {fails}")
