#!/usr/bin/env python3
"""Sampled sf1 oracle for q195_edit_distance_join (round-9 VERDICT item 7).

q195's full oracle is the n-squared levenshtein cross join -- 5.8e10 pairs
at sf1, infeasible in DuckDB -- so its sf1 evidence was pair-count + wall
only. This script upgrades that tier: it brute-verifies ALL pairs within
~200 deterministically sampled neighborhoods (noisy keys with
nk % 1201 == 7; ~240k/1201 at the x16 tree). For each sampled noisy
string the brute side compares against EVERY canonical string (no index,
no blocking -- guaranteed-complete within the stratum), and the stratum
must match the Spark output row-for-row, recorded as a sha256 over the
sorted row set.

Usage: python3 scripts/q195_stratum.py <sfDir> <sparkOutDir>
  <sfDir>       the scaled tree (e.g. /tmp/sf1z or /tmp/sf1m)
  <sparkOutDir> a Verify output dir containing q195_edit_distance_join/
"""
import hashlib
import os
import sys

import duckdb

STEP, RESID = 1201, 7
ALPHA = "abcdefghijklmnopqrstuvwxyz"

# 8-char base-26 spelling of the key -- the exact expression from the
# registered oracle (ops/Analytics.scala q195EditDistanceJoin).
NAME = " || ".join(
    f"substr('{ALPHA}', (k // {26 ** p}) % 26 + 1, 1)" for p in range(7, -1, -1))


def table_glob(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main(sf_dir, out_dir):
    con = duckdb.connect()
    cust = table_glob(sf_dir, "customer")
    brute_sql = f"""
    WITH canon AS (
      SELECT c_custkey AS ck, {NAME} AS canonical
      FROM (SELECT CAST(c_custkey AS BIGINT) AS k, c_custkey
            FROM read_parquet('{cust}'))
    ), noisy AS (
      SELECT ck AS nk,
        CASE ck % 3
          WHEN 0 THEN substr(canonical, 1, ck % 8) || substr(canonical, ck % 8 + 2, 16)
          WHEN 1 THEN substr(canonical, 1, ck % 8) ||
            substr('{ALPHA}', (ck * 17) % 26 + 1, 1) || substr(canonical, ck % 8 + 2, 16)
          ELSE canonical END AS noisy_name
      FROM canon
      WHERE ck % {STEP} = {RESID}
    )
    SELECT nk, noisy_name, ck, canonical,
      CAST(levenshtein(noisy_name, canonical) AS BIGINT) AS ed
    FROM noisy, canon
    WHERE levenshtein(noisy_name, canonical) <= 1
    ORDER BY nk, ck, canonical"""
    brute = con.execute(brute_sql).fetchall()
    n_hoods = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{cust}') "
        f"WHERE CAST(c_custkey AS BIGINT) % {STEP} = {RESID}").fetchone()[0]

    spark_sql = f"""
    SELECT nk, noisy_name, ck, canonical, ed
    FROM read_parquet('{out_dir}/q195_edit_distance_join/*.parquet')
    WHERE nk % {STEP} = {RESID}
    ORDER BY nk, ck, canonical"""
    got = con.execute(spark_sql).fetchall()

    def digest(rows):
        h = hashlib.sha256()
        for r in rows:
            h.update(repr(r).encode())
        return h.hexdigest()[:16]

    db, dg = digest(brute), digest(got)
    print(f"[q195-stratum] neighborhoods={n_hoods} brute_pairs={len(brute)} "
          f"spark_pairs={len(got)} brute_sha={db} spark_sha={dg}")
    if brute != got:
        # print first divergence for diagnosis
        for i, (a, b) in enumerate(zip(brute, got)):
            if a != b:
                print(f"FAIL first diff at row {i}: brute={a} spark={b}")
                break
        else:
            print(f"FAIL length mismatch: {len(brute)} vs {len(got)}")
        sys.exit(1)
    print("PASS q195 sampled-neighborhood stratum hash-match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
