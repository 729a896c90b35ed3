#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOut>

Reads each <verifyOut>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOut>/oracle_sql.json in DuckDB over the sfDir
tables, and compares row counts, sorted column names, and a hash of the
sorted rows.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name:24s} rows={len(got):7d}  (no oracle — rows-only)"
              + ("  EMPTY!" if len(got) == 0 else ""))
        continue
    exp = con.execute(oracle[name]).fetchdf()
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    status = []
    if gcols != ecols:
        status.append(f"SCHEMA got={gcols} exp={ecols}")
    elif len(got) != len(exp):
        status.append(f"ROWS got={len(got)} exp={len(exp)}")
    else:
        g = got[gcols].sort_values(gcols).reset_index(drop=True)
        e = exp[ecols].sort_values(ecols).reset_index(drop=True)
        for c in gcols:
            gv, ev = g[c], e[c]
            # EXACT compare, matching the driver's sorted-value hash:
            # numeric columns are widened to float64 first so that
            # int32-vs-int64 dtype gaps don't mask value equality, but
            # the VALUES must match bit-for-bit (no epsilon).
            try:
                import pandas as pd
                if (pd.api.types.is_numeric_dtype(gv)
                        and pd.api.types.is_numeric_dtype(ev)):
                    same = gv.astype(float).fillna(-9e99).equals(
                        ev.astype(float).fillna(-9e99))
                else:
                    same = gv.astype(str).equals(ev.astype(str))
            except Exception:
                same = False
            if not same:
                mism = (gv.astype(str) != ev.astype(str))
                i = mism.idxmax()
                near = ""
                try:
                    d = (gv.astype(float).fillna(-9e99) - ev.astype(float).fillna(-9e99)).abs().max()
                    near = f" max-abs-diff={d:g}"  # diagnostic only
                except Exception:
                    pass
                status.append(f"COL {c} dtype g={gv.dtype} e={ev.dtype} first-mismatch@{i}: got={gv[i]!r} exp={ev[i]!r} ({mism.sum()} rows){near}")
    if status:
        fail += 1
        print(f"{name:24s} FAIL  " + " | ".join(status))
    else:
        ok += 1
        print(f"{name:24s} OK    rows={len(got)}")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
