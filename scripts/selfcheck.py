#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares
result sets with columns sorted by name and rows sorted by all columns.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            gs = g.astype(str)
            ws = w.astype(str)
            neq = (gs != ws)
            if neq.any().any():
                bad_cols = [c for c in gs.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                print(f"FAIL {name}: value mismatch in {bad_cols}; first bad row {idx}:")
                print("  spark :", g.iloc[idx].to_dict())
                print("  duckdb:", w.iloc[idx].to_dict())
                # dtype hint
                print("  dtypes spark:", dict(g.dtypes.astype(str)),
                      "duckdb:", dict(w.dtypes.astype(str)))
                n_fail += 1
            else:
                # also surface dtype-level differences as warnings
                dt = [(c, str(g[c].dtype), str(w[c].dtype))
                      for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
                flag = f" (dtype diff: {dt})" if dt else ""
                print(f"PASS {name} ({len(g)} rows){flag}")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
