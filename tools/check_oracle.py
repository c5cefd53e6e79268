#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
Reads each <out>/<name>/ parquet and compares with the oracle SQL in
<out>/oracle_sql.json run against the sf tables in DuckDB.
Columns sorted by name; rows compared in full after sorting; floats
compared bit-exactly (repr) to mirror a hash compare.
"""
import sys, os, json, math
import duckdb

out, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, 'oracle_sql.json')))
names = sorted([d for d in os.listdir(out)
                if os.path.isdir(os.path.join(out, d))])
fails, passes, weak = [], [], []
for name in names:
    mine_path = os.path.join(out, name)
    try:
        mine = con.execute(
            f"SELECT * FROM read_parquet('{mine_path}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append((name, f"read my output: {e}"))
        continue
    if name not in oracle:
        weak.append((name, len(mine)))
        continue
    try:
        ref = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    mc, rc = sorted(mine.columns), sorted(ref.columns)
    if mc != rc:
        fails.append((name, f"columns differ: mine={mc} oracle={rc}"))
        continue
    mine, ref = mine[mc], ref[rc]
    if len(mine) != len(ref):
        fails.append((name, f"row count: mine={len(mine)} oracle={len(ref)}"))
        continue
    # row-order-insensitive exact compare (stringify cells)
    def canon(df):
        rows = []
        for row in df.itertuples(index=False):
            cells = []
            for v in row:
                if isinstance(v, float):
                    cells.append('NaN' if math.isnan(v) else repr(v))
                else:
                    cells.append(str(v))
            rows.append('|'.join(cells))
        return sorted(rows)
    a, b = canon(mine), canon(ref)
    if a == b:
        passes.append(name)
    else:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        fails.append((name, f"values differ, e.g. {diff}"))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"WEAK(rows-only) {len(weak)}: {' '.join(f'{n}({r})' for n, r in weak)}")
print(f"FAIL {len(fails)}:")
for n, why in fails:
    print(f"  {n}: {why[:400]}")
missing = set(oracle) - set(names)
if missing:
    print(f"MISSING OUTPUT (query failed in Verify): {sorted(missing)}")
sys.exit(1 if fails or missing else 0)
