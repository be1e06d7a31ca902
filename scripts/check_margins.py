#!/usr/bin/env python3
"""Hash-stability sweep for rounded/snapped oracle pins.

Two checks, run against a graft.Verify output dir (for oracle_sql.json):

1. Order-perturbation: replays every oracle twice — once over the parquet
   views, once over hash-shuffled materialized copies (different scan and
   aggregation order) — and reports any query whose sorted result set
   changes. A changed result means a rounded-double pin sits close enough
   to its rounding boundary for summation-order jitter to flip it: convert
   it to an integer-grid pin (floor(x*grid+0.5)::BIGINT on BOTH sides, the
   q102/q121 convention).

2. (retired in round 16) Grid-margin for q102 inertia / q103 max_cos: those
   pins were removed entirely — three rounds of driver-vs-builder DuckDB
   version skew proved that a margin measured under one engine version
   cannot bound another's values when the pinned aggregate sits downstream
   of a discontinuous round(avg(x),6) centroid / argmax decision. Both
   queries now hash only integers plus in-engine 1.0-tolerance flags.

Round-14 recorded results (sf0.01, full shuffle): 0/131 order-sensitive.
Round-16: 0 order-sensitive with q102/q103 float pins removed.

Usage: python3 scripts/check_margins.py <verify_out_dir> [sf_dir]
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run(con, sql):
    rows = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in order) for r in rows)


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracles = json.loads(open(f"{out}/oracle_sql.json").read())

    con1 = duckdb.connect()
    con2 = duckdb.connect()
    for t in TABLES:
        con1.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        con2.execute(
            f"CREATE TABLE {t} AS SELECT * FROM (SELECT *, row_number() "
            f"OVER () AS __rn FROM '{sf}/{t}.parquet') ORDER BY hash(__rn + 7)")
        con2.execute(f"ALTER TABLE {t} DROP COLUMN __rn")

    sensitive = 0
    for name, sql in sorted(oracles.items()):
        try:
            a, b = run(con1, sql), run(con2, sql)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            print(f"ERR {name}: {str(e)[:120]}")
            continue
        if a != b:
            sensitive += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:1]
            print(f"ORDER-SENSITIVE {name}: {diff}")
    print(f"order-sensitive: {sensitive}/{len(oracles)}")

    # guard: no float-derived hash pins may reappear on float32-sourced
    # math (the q102/q103 failure class) — flag any oracle that snaps or
    # rounds an aggregate of the embedding column into a hashed value
    for name, sql in sorted(oracles.items()):
        if "embedding" not in sql:
            continue
        for marker in ("floor(sum(dist2)", "floor(max(best_cos)"):
            if marker in sql:
                print(f"FLOAT-PIN-REGRESSION {name}: {marker}")


if __name__ == "__main__":
    main()
