#!/usr/bin/env python3
"""Generate a 10x scale-up of /root/testdata/sf0.1 into testdata-sf1/ —
the measured-scaling exhibit (VERDICT r8 #2): every correctness claim is
sf0.001-0.1; this corpus exists so the heavy keys can be TIMED at another
10x and the "survives 100x" plan arguments become a measured curve.

NOT oracle-checked (the driver's DuckDB gate only runs the sf dirs it
generated); distributions are preserved, key spaces are shifted per copy
so referential integrity holds:

- region/nation: fixed dims, copied as-is.
- customer/supplier/part/orders/lineitem/events: 10 copies, every key
  (and FK) shifted by copy*max_key; o_orderdate/l_shipdate/ts shifted by
  `copy` microseconds so copies aren't bit-identical on time.
- documents: copy 0 verbatim; copies 1-9 keep each original row's exact
  token COUNT but remap every token through a seeded hash over the
  31-word vocabulary — preserves length/Zipf structure while breaking
  exact/near-dup ties (a naive 10x text copy would plant quadratic
  LSH-candidate growth and fake a superlinear dedup curve).
- embeddings: copies keep labels; vectors are circularly rotated by
  4*copy dims with a small per-copy deterministic jitter — same norm
  distribution, fresh neighbor structure.

Usage: python3 scripts/gen_sf1.py [outdir]   (default testdata-sf1/)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata-sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def gen(table: str, sql_per_copy: str) -> None:
        selects = " UNION ALL ".join(
            sql_per_copy.format(i=i) for i in range(COPIES))
        con.execute(
            f"COPY ({selects}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    gen("customer", f"""
        SELECT c_custkey + {{i}} * 15000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""")
    gen("supplier", f"""
        SELECT s_suppkey + {{i}} * 1000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{SRC}/supplier.parquet'""")
    gen("part", f"""
        SELECT p_partkey + {{i}} * 20000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet'""")
    gen("orders", f"""
        SELECT o_orderkey + {{i}} * 150000 AS o_orderkey,
               o_custkey + {{i}} * 15000 AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate + INTERVAL ({{i}}) MICROSECOND
                 AS o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""")
    gen("lineitem", f"""
        SELECT l_orderkey + {{i}} * 150000 AS l_orderkey,
               l_partkey + {{i}} * 20000 AS l_partkey,
               l_suppkey + {{i}} * 1000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus,
               l_shipdate + INTERVAL ({{i}}) MICROSECOND AS l_shipdate
        FROM '{SRC}/lineitem.parquet'""")
    gen("events", f"""
        SELECT event_id + {{i}} * 100000 AS event_id,
               ts + INTERVAL ({{i}}) MICROSECOND AS ts,
               user_id + {{i}} * 100000 AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'""")

    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(regexp_split_to_array(text, ' ')) AS w "
        f"FROM '{SRC}/documents.parquet' ORDER BY w").fetchall()]
    vlit = "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in vocab) + "]"
    gen("documents", f"""
        SELECT doc_id + {{i}} * 5000 AS doc_id,
               CASE WHEN {{i}} = 0 THEN text
                    ELSE array_to_string(list_transform(
                      regexp_split_to_array(text, ' '),
                      (w, p) -> ({vlit})[CAST(1 + abs(hash(doc_id, {{i}}, p, w))
                                         % {len(vocab)} AS BIGINT)]), ' ')
               END AS text,
               lang, source,
               CASE WHEN {{i}} = 0 THEN n_chars
                    ELSE length(array_to_string(list_transform(
                      regexp_split_to_array(text, ' '),
                      (w, p) -> ({vlit})[CAST(1 + abs(hash(doc_id, {{i}}, p, w))
                                         % {len(vocab)} AS BIGINT)]), ' '))
               END AS n_chars
        FROM '{SRC}/documents.parquet'""")

    gen("embeddings", f"""
        SELECT vec_id + {{i}} * 2000 AS vec_id,
               CAST(list_transform(range(1, 65), j ->
                 embedding[CAST(1 + ((j - 1 + 4 * {{i}}) % 64) AS BIGINT)]
                   + CAST((abs(hash(vec_id, {{i}}, j)) % 1000) AS FLOAT)
                     / 100000.0) AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet'""")


if __name__ == "__main__":
    main()
