#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = views over <sfDir>/*.parquet), read the Spark result parquet,
sort columns by name, and compare row-by-row (exact for non-floats,
1e-9 relative tolerance reported separately for floats — the driver
hash-match needs exact, so any nonzero float diff is flagged).
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        try:
            rel = con.sql(sql)
            # The driver's hash serializes HUGEINT/DECIMAL differently from
            # Spark's BIGINT/DOUBLE even when pandas values compare equal
            # (the r5 n42/q27 failure class) — flag them before fetchdf()
            # erases the type.
            wide = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                    if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
            if wide:
                print(f"FAIL {name}: oracle emits non-BIGINT integer/decimal "
                      f"types (driver hash will mismatch): {wide} — "
                      f"CAST(... AS BIGINT/DOUBLE) in the oracle SQL")
                n_fail += 1
                continue
            oracle = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        o = oracle[sorted(oracle.columns)]
        m = mine[sorted(mine.columns)]
        if list(o.columns) != list(m.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(m.columns)}")
            n_fail += 1
            continue
        if len(o) != len(m):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(m)}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(o.columns):
            ov, mv = o[c].tolist(), m[c].tolist()
            for ri in range(len(ov)):
                a, b = norm(ov[ri]), norm(mv[ri])
                if a is None and b is None:
                    continue
                anan = isinstance(a, float) and a != a
                bnan = isinstance(b, float) and b != b
                if anan and bnan:
                    continue
                try:
                    import pandas as pd
                    if pd.isna(a) and pd.isna(b):
                        continue
                except Exception:
                    pass
                if a != b:
                    bad = (c, ri, a, b)
                    break
            if bad:
                break
        if bad:
            c, ri, a, b = bad
            print(f"FAIL {name}: first diff col={c} row={ri} oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(sqls)} oracled (+{_rows_only(out_dir, sqls)} rows-only)")

def _rows_only(out_dir, sqls):
    import os
    # a subset run (SPARK_GRAFT_ONLY) writes subset.txt: stale result
    # dirs from a previous full run must not be counted as coverage
    if os.path.exists(os.path.join(out_dir, "subset.txt")):
        return 0
    qs = [d for d in os.listdir(out_dir)
          if os.path.isdir(os.path.join(out_dir, d))]
    return len([q for q in qs if q not in sqls])

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
