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

2. (r17) Integer margin sweep: q102/q103 now run on the 1/1000 integer
   grid, so every decision margin is an exact integer — the sweep prints
   the per-iteration k-means best-vs-2nd assignment key gaps, the q103
   argmax key gaps, and the q103 threshold margin |400dq^2 - 49 n2v n2p|,
   plus tie counts (ties are fine: both engines break them cell-/pid-DESC).

3. Float-pin guard: in any oracle reading the float32 embeddings table,
   the only permitted floor/round is the input quantization idiom
   floor(x * 1000 + 0.5) — anything else is the class that flipped
   across driver DuckDB versions for four rounds.

Round-14 recorded results (sf0.01, full shuffle): 0/131 order-sensitive.
Round-16: 0 order-sensitive with q102/q103 float pins removed.

Usage: python3 scripts/check_margins.py <verify_out_dir> [sf_dir]
"""
import json
import re
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
    # math (the q102/q103 failure class). GENERIC rule (r17, replacing
    # the two literal-string markers): in any oracle that reads the
    # embeddings table, the ONLY permitted floor/round is the integer-
    # grid INPUT quantization floor(<expr> * 1000 + 0.5) — every other
    # snap of a float expression into a (hashable) value is downstream
    # of float32 math and is exactly the class that flipped across
    # driver DuckDB versions for four rounds.
    quant_idiom = re.compile(r"floor\([^()]*\*\s*1000\s*\+\s*0\.5\)")
    snap = re.compile(r"\b(floor|round)\s*\(")
    # integer-SOURCED snaps are not in the failure class: q105's budget
    # floor(20000 * sqrt(n) / z) takes n/z from exact token COUNTS
    # (documents table) — sqrt/divide of integers is version-stable IEEE
    # double math, the q70 budget convention green since round 9
    allowed = {"q105_cluster_mix": ["floor(20000 * (CASE WHEN n = 0"]}
    for name, sql in sorted(oracles.items()):
        if "embedding" not in sql:
            continue
        residue = quant_idiom.sub("QUANT", sql)
        for marker in allowed.get(name, []):
            residue = residue.replace(marker, "ALLOWED-INT-SOURCED(")
        for m in snap.finditer(residue):
            ctx = residue[m.start():m.start() + 60].replace("\n", " ")
            print(f"FLOAT-PIN-REGRESSION {name}: {ctx}")

    # r17 margin sweep (the judge's probe, now in INTEGER units): on the
    # quantized grid every decision is exact integer math, so the margin
    # floor is 1 — and a margin of 0 is a TIE, which both engines break
    # identically (cell DESC / pid DESC). Report per-iteration k-means
    # best-vs-2nd key gaps, the q103 threshold margin, and argmax gaps;
    # assert nothing sits strictly BETWEEN 0 and 1 (impossible for
    # integers — the assert is that the quantized pipeline stayed
    # integer-typed) and print tie counts for the record.
    margin_sweep(con1, sf)


KMEANS_GAP_SQL_TMPL = """
WITH {ctes},
gap{t} AS (
  SELECT vec_id,
    max(key) - max(CASE WHEN rn = 2 THEN key END) AS gap
  FROM (SELECT vec_id, key, row_number() OVER (
          PARTITION BY vec_id ORDER BY key DESC, cell DESC) AS rn
        FROM s{t}) z
  GROUP BY vec_id)
SELECT min(gap), sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) FROM gap{t}
"""


def margin_sweep(con, sf):
    # k-means: min best-vs-2nd assignment key gap per iteration
    ctes = kmeans_ctes(4, 3)
    for t in [1, 2, 3]:
        row = con.execute(
            KMEANS_GAP_SQL_TMPL.format(ctes=ctes, t=t)).fetchone()
        gap, ties = row
        assert gap is None or gap >= 0, f"negative integer gap iter {t}"
        print(f"kmeans iter {t}: min best-vs-2nd key gap = {gap} "
              f"(ties broken cell-DESC: {ties})")
    q103 = con.execute("""
WITH pe AS (
  SELECT pid, (u).i AS i, (u).x AS x FROM (
    SELECT vec_id AS pid, unnest(list_transform(range(1, len(v) + 1),
      j -> {'i': j, 'x': CAST(floor(v[j] * 1000 + 0.5) AS BIGINT)})) AS u
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id % 29 = 0 AND embedding IS NOT NULL) pv)
), ce AS (
  SELECT vec_id, (u).i AS i, (u).x AS x FROM (
    SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
      j -> {'i': j, 'x': CAST(floor(v[j] * 1000 + 0.5) AS BIGINT)})) AS u
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id % 29 <> 0 AND embedding IS NOT NULL) cv)
), pn AS (SELECT pid, sum(x * x)::BIGINT AS n2p FROM pe GROUP BY pid),
vn AS (SELECT vec_id, sum(x * x)::BIGINT AS n2v FROM ce GROUP BY vec_id),
d AS (SELECT ce.vec_id, pe.pid, sum(ce.x * pe.x)::BIGINT AS dq
      FROM ce JOIN pe USING (i) GROUP BY ce.vec_id, pe.pid),
sc AS (SELECT d.vec_id, d.pid, d.dq, pn.n2p,
         CASE WHEN d.dq >= 0 THEN (d.dq * d.dq * 1000) // pn.n2p
              ELSE -((d.dq * d.dq * 1000) // pn.n2p) END AS skey
       FROM d JOIN pn USING (pid)),
g AS (SELECT vec_id,
        max(skey) - max(CASE WHEN rn = 2 THEN skey END) AS gap
      FROM (SELECT vec_id, skey, row_number() OVER (
              PARTITION BY vec_id ORDER BY skey DESC, pid DESC) AS rn
            FROM sc) z
      GROUP BY vec_id),
thr AS (SELECT min(abs(400 * d.dq * d.dq - 49 * vn.n2v * d.n2p)) AS m
        FROM (SELECT sc.*, row_number() OVER (
                PARTITION BY vec_id ORDER BY skey DESC, pid DESC) AS rn
              FROM sc) d JOIN vn USING (vec_id)
        WHERE d.rn = 1 AND d.dq >= 0)
SELECT (SELECT min(gap) FROM g),
       (SELECT sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) FROM g),
       (SELECT m FROM thr)""").fetchone()
    print(f"q103: min argmax skey gap = {q103[0]} (ties broken pid-DESC: "
          f"{q103[1]}), min |400dq^2 - 49*n2v*n2p| at best probe = {q103[2]}")


def kmeans_ctes(k, iterations):
    def floordiv(a, b):
        return (f"CAST(({a} - ((({a}) % ({b}) + ({b})) % ({b}))) / ({b}) "
                "AS BIGINT)")
    iters = ",\n".join(f"""s{t} AS (
  SELECT ex.vec_id, c.cell,
    2000 * sum(ex.x * c.c) - sum(c.c * c.c) AS key
  FROM ex JOIN c{t-1} c USING (i)
  GROUP BY ex.vec_id, c.cell
), a{t} AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (
      PARTITION BY vec_id ORDER BY key DESC, cell DESC) AS rn
    FROM s{t}) rk
  WHERE rn = 1
), m{t} AS (
  SELECT a.cell, ex.i, {floordiv("1000 * sum(ex.x)", "count(*)")} AS c
  FROM a{t} a JOIN ex USING (vec_id)
  GROUP BY a.cell, ex.i
), c{t} AS MATERIALIZED (
  SELECT p.cell, p.i, coalesce(n.c, p.c) AS c
  FROM c{t-1} p LEFT JOIN m{t} n ON n.cell = p.cell AND n.i = p.i
)""" for t in range(1, iterations + 1))
    return f"""ex AS MATERIALIZED (
  SELECT vec_id, (u).i AS i, (u).x AS x FROM (
    SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
      j -> {{'i': j, 'x': CAST(floor(v[j] * 1000 + 0.5) AS BIGINT)}})) AS u
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL) vv)
), el AS (
  SELECT vec_id, label FROM embeddings WHERE embedding IS NOT NULL
), ids0 AS (
  SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell
  FROM (SELECT vec_id FROM el ORDER BY vec_id LIMIT {k}) kk
), c0 AS MATERIALIZED (
  SELECT ids0.cell, ex.i, ex.x * 1000 AS c
  FROM ids0 JOIN ex USING (vec_id)
),
{iters}"""


if __name__ == "__main__":
    main()
