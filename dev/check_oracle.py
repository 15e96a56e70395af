#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool, not library code).

Usage: python3 dev/check_oracle.py <sfDir> <outDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Registers each parquet table as a DuckDB view, runs oracle_sql.json,
and compares values (column-name-sorted, row-sorted) against the
Spark parquet dumps. Reports exact/loose match per query.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    qdir = f"{out_dir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fail += 1; continue
    # array columns come back as numpy arrays — unhashable/unsortable;
    # tuple-ize so sort_values and equals work cell-wise
    import numpy as np
    for df in (got, want):
        for c in df.columns:
            if df[c].map(lambda v: isinstance(v, (np.ndarray, list))).any():
                df[c] = df[c].map(lambda v: tuple(v.tolist())
                                  if isinstance(v, np.ndarray) else
                                  tuple(v) if isinstance(v, list) else v)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    dtype_note = ""
    if list(gs.dtypes) != list(ws.dtypes):
        diffs = [(c, str(gs.dtypes[c]), str(ws.dtypes[c]))
                 for c in gs.columns if str(gs.dtypes[c]) != str(ws.dtypes[c])]
        dtype_note = f"  DTYPE-MISMATCH {diffs}"
    # exact compare incl. NaN==NaN
    eq = gs.equals(ws.astype(gs.dtypes.to_dict(), errors="ignore"))
    if eq:
        print(f"OK   {name} ({len(got)} rows){dtype_note}")
    else:
        diff = (gs != ws) & ~(gs.isna() & ws.isna())
        ndiff = int(diff.to_numpy().sum())
        print(f"FAIL {name}: {ndiff} differing cells of {gs.size}")
        bad = diff.any(axis=1)
        print("  spark:", gs[bad].head(3).to_dict("records"))
        print("  duck :", ws[bad].head(3).to_dict("records"))
        fail += 1
print("PASS" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
