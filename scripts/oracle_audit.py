#!/usr/bin/env python3
"""Sweep the whole DuckDB oracle corpus for hash-level landmines the
local tolerance compare (oracle_check.py) cannot see but the driver's
exact-value hash does:

  1. signed zero: a float cell that is -0.0 (DuckDB round() preserves
     the sign of zero; Spark's BigDecimal round normalizes to +0.0) —
     a DETERMINISTIC driver mismatch.
  2. near-boundary: a float cell whose value sits within `eps` of a
     0.5*10^-k rounding boundary for k in 2..8 — run-to-run partial-
     merge drift on the Spark side can flip these.

Usage: python3 scripts/oracle_audit.py [sf_dir] [oracle_dump]
(run `sbt "runMain graft.tools.DumpOracle /tmp/oracle_all.txt"` first)
"""
import sys, os, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_all.txt"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

queries = {}
name = None
for line in open(dump):
    if line.startswith("=====QUERY====="):
        name = line.split()[-1]
        queries[name] = []
    else:
        queries[name].append(line)
queries = {k: "".join(v) for k, v in queries.items()}

neg_zero, near_boundary, errors = [], [], []
for name in sorted(queries):
    try:
        df = con.execute(queries[name]).fetchdf()
    except Exception as e:
        errors.append((name, str(e)[:120]))
        continue
    for c in df.columns:
        if not str(df[c].dtype).startswith(("float", "Float")):
            continue
        vals = df[c].dropna()
        nz = [v for v in vals if v == 0.0 and math.copysign(1, v) < 0]
        if nz:
            neg_zero.append((name, c, len(nz)))
        # which decimal scale was this column rounded at? detect from data
        for v in vals:
            if v == 0 or not math.isfinite(v):
                continue
            for k in range(2, 9):
                x = abs(v) * 10**k
                if x > 1e13:
                    break
                frac = x - math.floor(x)
                # populated at scale k (nonzero frac at k+1 means deeper)
                d = abs(frac - 0.5)
                if 1e-12 < d < 2e-7 * max(1.0, x * 1e-6):
                    near_boundary.append((name, c, v, k, d))
                    break

print("== -0.0 cells (deterministic driver mismatch if Spark emits +0.0) ==")
for r in neg_zero:
    print("  NEGZERO", r)
print("== near-half-boundary cells (run-to-run flake candidates) ==")
for r in near_boundary[:40]:
    print("  NEARHALF", r)
print("== oracle SQL errors ==")
for r in errors:
    print("  ERR", r)
print(f"\nswept {len(queries)} queries: {len(neg_zero)} negzero, "
      f"{len(near_boundary)} nearhalf, {len(errors)} errors")
