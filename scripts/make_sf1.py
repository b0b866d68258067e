"""Synthesize an sf1-scale dataset (10x sf0.1) for the parity
spot-check (VERDICT r1 item 9).

The container has no network, so DuckDB's tpch extension (dbgen)
cannot be installed; instead we replicate the driver's sf0.1 parquet
10x with disjoint key offsets, which preserves every FK relationship
and multiplies row counts exactly 10x:

- region / nation: unchanged (fixed-size dimensions, as in TPC-H).
- customer / supplier / part / orders / lineitem: replica i offsets
  every key column by i * (max_key + 1) of its table, so joins stay
  1:1 with the original within each replica and never cross replicas.
- documents: replica i rewrites every whitespace token w ->
  md5(w || 'r<i>')[1:9] (replica 0 keeps the original text). Within a
  replica the near-duplicate structure is EXACTLY preserved (the same
  token bijection is applied to all docs), while across replicas the
  shingle sets are disjoint — so dedup density scales like real data
  instead of creating artificial 10-way duplicate clusters.
- events / embeddings: replicated with id offsets (values unchanged;
  ANN query ids 0-4 keep their original vectors via replica 0).

This is NOT official dbgen data; it exists to demonstrate that the
cross-engine exactness tricks (decimal-exact aggregation, portable
hashing, sequential-double dot products) hold at another 10x scale,
with both engines reading the SAME files.

Usage: python scripts/make_sf1.py [out_dir] [replicas]
       (defaults /tmp/sf1synth, 10; replicas=100 builds an sf10-scale
       set, e.g. /tmp/sf10synth — same disjoint-key construction, so
       FK joins and within-replica dedup structure hold at 100x too)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10  # default; overridable via argv (100 -> sf10 scale)
SRC_DOCS = 5000  # doc_id stride per replica (= sf0.1 documents count)

OFFSETS = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                 "l_suppkey": 1000},
    "events": {"event_id": 100000},
    "embeddings": {"vec_id": 2000},
}


def replicate_sql(table: str, offsets: dict[str, int], cols: list[str],
                  replicas: int = REPLICAS) -> str:
    parts = []
    for i in range(replicas):
        sel = ", ".join(
            f"{c} + {i * offsets[c]} AS {c}" if c in offsets else c
            for c in cols
        )
        parts.append(f"SELECT {sel} FROM src")
    return " UNION ALL ".join(parts)


def documents_sql(replicas: int = REPLICAS) -> str:
    parts = ["SELECT doc_id, text, lang, source, n_chars FROM src"]
    for i in range(1, replicas):
        # per-replica token bijection: same word -> same hash within a
        # replica (near-dup structure preserved), different across
        parts.append(f"""
SELECT doc_id + {i * SRC_DOCS} AS doc_id,
  array_to_string(
    list_transform(string_split(text, ' '),
                   w -> substr(md5(w || 'r{i}'), 1, 8)),
    ' ') AS text,
  lang, source, n_chars
FROM src""")
    return " UNION ALL ".join(parts)


def main(out_dir: str = "/tmp/sf1synth", replicas: str | int = REPLICAS) -> None:
    replicas = int(replicas)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, offs in OFFSETS.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'")
        cols = [r[0] for r in con.execute("DESCRIBE src").fetchall()]
        con.execute(
            f"COPY ({replicate_sql(t, offs, cols, replicas)}) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/documents.parquet'")
    con.execute(
        f"COPY ({documents_sql(replicas)}) TO '{out_dir}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main(*sys.argv[1:])
