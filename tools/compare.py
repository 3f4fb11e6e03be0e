#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
over the sf parquet tables, load the Spark result parquet from Verify's
outDir, sort columns by name + rows by value, and diff."""
import json, sys, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# parallel gate runs (several compare.py workers over disjoint query
# subsets) each cap their DuckDB thread pool so N workers share the host
import os as _os
if _os.environ.get("DUCKDB_THREADS"):
    con.execute(f"PRAGMA threads={int(_os.environ['DUCKDB_THREADS'])}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata ships single-file tables; ScaleUp output is a
    # Spark parquet DIRECTORY of part files — glob accordingly
    import os
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
only = set(sys.argv[3:])
if only:
    unknown = only - set(oracle)
    if unknown:
        # a typo'd name would otherwise filter to {} and "pass" vacuously
        print(f"FAIL: unknown query name(s): {sorted(unknown)}")
        sys.exit(1)
    oracle = {k: v for k, v in oracle.items() if k in only}

class NonScalarCell(Exception):
    pass

def canon(df):
    cols = sorted(df.columns)
    # PARITY GUARD (r8 verdict #7): the driver's harness sorts via pandas,
    # which cannot hash/factorize ndarray or list cells — an array-typed
    # output column passes a stringifying gate locally but crashes the
    # driver. Reject non-scalar cells here so the two gates cannot
    # diverge: oracle-checked query outputs must be scalar columns only.
    import numpy as np
    rows = []
    for r in df[cols].itertuples(index=False):
        row = []
        for c, v in zip(cols, r):
            if isinstance(v, (np.ndarray, list, dict, tuple)):
                raise NonScalarCell(
                    f"non-scalar cell in column '{c}' ({type(v).__name__}) — "
                    "oracle-checked outputs must be scalar columns only")
            if isinstance(v, float):
                row.append("NaN" if math.isnan(v) else str(round(v, 6)))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
        got = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        wc, wr = canon(want)
        gc, gr = canon(got)
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if wc != gc:
        print(f"FAIL {name}: columns want={wc} got={gc}")
        fails += 1
    elif wr != gr:
        diff = [(a, b) for a, b in zip(wr, gr) if a != b][:3]
        extra = f" rowcount want={len(wr)} got={len(gr)}" if len(wr) != len(gr) else ""
        print(f"FAIL {name}: rows differ{extra}; first diffs: {diff}")
        fails += 1
    else:
        # dtype check (driver also schema-checks)
        wd, gd = want.dtypes.sort_index(), got.dtypes.sort_index()
        if list(wd) != list(gd):
            print(f"WARN {name}: dtypes differ want={dict(wd)} got={dict(gd)} (values match)")
        print(f"ok   {name} ({len(wr)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
