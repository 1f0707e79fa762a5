#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: verify_local.py <outDir> <sfDir> [query ...]
Reads <outDir>/oracle_sql.json, registers each testdata parquet as a view,
runs each oracle in DuckDB, reads the Spark result parquet, canonicalizes
(sort columns by name, sort rows by all columns) and compares values.
"""
import json, math, sys

import duckdb

outdir = sys.argv[1]
sfdir = sys.argv[2]
only = set(sys.argv[3:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        exp = con.sql(sql).fetchall()
        expcols = [d[0] for d in con.sql(sql).description]
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        got = got_rel.fetchall()
        gotcols = [d[0] for d in got_rel.description]
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fail += 1
        continue
    # canonicalize: sort columns by name, then sort rows
    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        # None-safe sort (rollup/cube emit NULL group keys); equality
        # checks below remain exact
        def key(row):
            return tuple((v is None, str(type(v)), str(v)) for v in row)
        return sorted((tuple(r[i] for i in order) for r in rows), key=key), \
            [cols[i] for i in order]
    erows, ecols = canon(exp, expcols)
    grows, gcols = canon(got, gotcols)
    if ecols != gcols:
        print(f"FAIL {name}: columns differ  oracle={ecols}  spark={gcols}")
        fail += 1
        continue
    # column-type parity (warn: the driver may or may not enforce this)
    etypes = dict(con.sql(f"DESCRIBE {sql}").fetchall() and
                  [(r[0], r[1]) for r in con.sql(f"DESCRIBE {sql}").fetchall()])
    gtypes = dict((r[0], r[1]) for r in
                  con.sql(f"DESCRIBE SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall())
    for c in ecols:
        if etypes.get(c) != gtypes.get(c):
            print(f"WARN {name}: col {c} type oracle={etypes.get(c)} spark-parquet={gtypes.get(c)}")
    if len(erows) != len(grows):
        print(f"FAIL {name}: rowcount oracle={len(erows)} spark={len(grows)}")
        fail += 1
        continue
    bad = None
    for i, (er, gr) in enumerate(zip(erows, grows)):
        for c, (ev, gv) in enumerate(zip(er, gr)):
            if ev != gv:
                if isinstance(ev, float) and isinstance(gv, float):
                    if math.isnan(ev) and math.isnan(gv):
                        continue
                bad = (i, ecols[c], ev, gv)
                break
        if bad:
            break
    if bad:
        i, c, ev, gv = bad
        print(f"FAIL {name}: row {i} col {c}: oracle={ev!r} spark={gv!r}")
        fail += 1
    else:
        print(f"OK   {name}: {len(erows)} rows")
sys.exit(1 if fail else 0)
