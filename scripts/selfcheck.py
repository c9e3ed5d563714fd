#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — strictly harder.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares
result sets with columns sorted by name and rows sorted by all columns.

Strictness (ADVICE.md r01): the driver hash-compares *rendered* values, so
a Spark DECIMAL column vs a DuckDB float64 column fails there even when
values are numerically identical. This gate therefore:
  * fetches exact values via fetchall() (decimal.Decimal preserved, no
    pandas float64 coercion), and
  * treats any column TYPE difference between the Spark parquet and the
    oracle result as a FAILURE, not a warning.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [q1,q2,...]
(the optional third arg restricts the check to those query names — pair it
with SPARK_GRAFT_ONLY on the Verify side)
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_glob(sf_dir, t):
    """Fixture tables are either a single parquet FILE (driver testdata)
    or a DIRECTORY of part files (graft.Split fixtures) — glob the dir."""
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def fetch(con, sql):
    """Run sql; return (colnames, coltypes, canonical sorted rows)."""
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # sort columns by name (driver behavior), then rows by all values
    order = sorted(range(len(names)), key=lambda i: names[i])
    names_sorted = [names[i] for i in order]
    types = con.execute(f"DESCRIBE {sql}").fetchall()
    tmap = {t[0]: t[1] for t in types}
    types_sorted = [tmap[n] for n in names_sorted]
    canon_rows = sorted(
        [tuple(r[i] for i in order) for r in rows],
        key=lambda row: tuple(
            (v is not None, str(type(v)), str(v)) for v in row))
    return names_sorted, types_sorted, canon_rows


def vals_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b and type(a) is type(b)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # comma-separated query names: check just those
        names = {n.strip() for n in only.split(",") if n.strip()}
        unknown = names - oracles.keys()
        if unknown:  # a typo'd filter must not read as a green run
            print(f"ERROR: unknown query name(s) in filter: {sorted(unknown)}")
            return 1
        total = len(oracles)
        oracles = {k: v for k, v in oracles.items() if k in names}
        # A filtered run must never read as the full gate (ADVICE r04):
        # mark it in the summary so saved logs are unambiguous.
        subset_tag = f"SUBSET ({len(oracles)} of {total} queries) "
    else:
        subset_tag = ""
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            g_names, g_types, g_rows = fetch(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            w_names, w_types, w_rows = fetch(con, sql)
            if g_names != w_names:
                print(f"FAIL {name}: columns {g_names} vs {w_names}")
                n_fail += 1
                continue
            if g_types != w_types:
                diffs = [(n, gt, wt) for n, gt, wt
                         in zip(g_names, g_types, w_types) if gt != wt]
                print(f"FAIL {name}: column TYPE mismatch {diffs}")
                n_fail += 1
                continue
            if len(g_rows) != len(w_rows):
                print(f"FAIL {name}: rows {len(g_rows)} vs {len(w_rows)}")
                n_fail += 1
                continue
            bad = None
            for i, (gr, wr) in enumerate(zip(g_rows, w_rows)):
                for c, (gv, wv) in enumerate(zip(gr, wr)):
                    if not vals_equal(gv, wv):
                        bad = (i, g_names[c], gv, wv)
                        break
                if bad:
                    break
            if bad:
                i, cname, gv, wv = bad
                print(f"FAIL {name}: value mismatch row {i} col {cname}: "
                      f"spark={gv!r} ({type(gv).__name__}) "
                      f"duckdb={wv!r} ({type(wv).__name__})")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g_rows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {subset_tag}{n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
