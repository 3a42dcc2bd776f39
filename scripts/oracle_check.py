#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle (oracle_sql.json) on the same parquet tables.

Usage: python3 scripts/oracle_check.py [sf_dir] [verify_out]
(run `sbt "runMain graft.Verify <sf_dir> <verify_out>"` first)
"""
import sys, os, json, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    spark_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"SQL_ERROR: {str(e)[:200]}"
        continue
    # driver semantics: sort columns by name, then compare values
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        results[name] = f"SCHEMA: spark={list(sdf.columns)} oracle={list(odf.columns)}"
        continue
    if len(sdf) != len(odf):
        results[name] = f"ROWS: spark={len(sdf)} oracle={len(odf)}"
        continue
    # row-order-insensitive compare (sort rows by all columns)
    cols = list(sdf.columns)
    s2 = sdf.sort_values(cols, na_position="first").reset_index(drop=True)
    o2 = odf.sort_values(cols, na_position="first").reset_index(drop=True)
    mismatch = None
    for c in cols:
        a, b = s2[c], o2[c]
        try:
            import pandas as pd
            af = str(a.dtype).startswith(("float", "Float"))
            bf = str(b.dtype).startswith(("float", "Float"))
            if af != bf:
                # driver hashes exact values: int 5 vs float 5.0 mismatch.
                # (DuckDB sum(BIGINT) -> HUGEINT -> float64 is the usual cause;
                # CAST(... AS BIGINT) in the oracle SQL.)
                mismatch = f"COL {c}: dtype spark={a.dtype} oracle={b.dtype} (int vs float)"
                break
            if af or bf:
                # driver semantics: EXACT value hash — repr-level compare,
                # so 0.0 vs -0.0 and last-ulp drift FAIL here like they
                # fail driver-side (the r8 q_groupby_cov lesson: a 1e-9
                # tolerance hid a signed-zero mismatch).
                aa = a.map(repr).where(~a.isna(), "<NA>")
                bb = b.map(repr).where(~b.isna(), "<NA>")
                bad = aa != bb
                if bad.any() and ((a - b).abs().fillna(0) < 1e-9).all():
                    i = bad.idxmax()
                    mismatch = (f"COL {c} row {i}: spark={a[i]!r} "
                                f"oracle={b[i]!r} (EXACT-ONLY: within 1e-9 "
                                f"tolerance but driver hashes exact)")
                    break
            else:
                aa = a.astype(str).where(~a.isna(), "<NA>")
                bb = b.astype(str).where(~b.isna(), "<NA>")
                bad = aa != bb
            if bad.any():
                i = bad.idxmax()
                mismatch = f"COL {c} row {i}: spark={a[i]!r} oracle={b[i]!r} ({int(bad.sum())} bad)"
                break
        except Exception as e:
            mismatch = f"COL {c}: compare error {str(e)[:120]}"
            break
    results[name] = mismatch or "OK"

n_ok = sum(1 for v in results.values() if v == "OK")
for k, v in results.items():
    print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  " + v))
print(f"\n{n_ok}/{len(results)} queries match (+ rows-only: "
      f"{sorted(set(os.path.basename(p) for p in glob.glob(out_dir + '/q_*')) - set(oracle))})")
sys.exit(0 if n_ok == len(results) else 1)
