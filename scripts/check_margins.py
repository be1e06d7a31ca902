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

2. Grid-margin: for the explicitly integer-grid-pinned cells (q102 inertia,
   q103 max_cos), measures the distance of the pre-snap value from the
   nearest floor boundary. Margins must sit orders above cross-engine ulp
   noise (~1e-12 relative).

Round-14 recorded results (sf0.01, full shuffle): 0/131 order-sensitive;
q102 inertia margin >= 0.091 grid units, q103 max_cos margin >= 0.021
across sf0.001/0.01/0.1.

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

    # grid margins for the integer-pinned cells
    if "q102_kmeans" in oracles:
        sql = oracles["q102_kmeans"].replace(
            "CAST(floor(sum(dist2) * 1000 + 0.5) AS BIGINT) AS inertia_i",
            "sum(dist2) * 1000 + 0.5 AS g")
        sql = sql[:sql.rindex("SELECT")] + \
            "SELECT min(least(g - floor(g), ceil(g) - g)) FROM pc"
        print("q102 inertia grid margin:", con1.execute(sql).fetchone()[0])
    if "q103_embedding_decontam" in oracles:
        sql = oracles["q103_embedding_decontam"].replace(
            "CAST(floor(max(best_cos) * 1000000 + 0.5) AS BIGINT) AS max_cos_i",
            "max(best_cos) * 1000000 + 0.5 AS g")
        m = con1.execute(
            f"SELECT min(least(g - floor(g), ceil(g) - g)) FROM ({sql})"
        ).fetchone()[0]
        print("q103 max_cos grid margin:", m)


if __name__ == "__main__":
    main()
