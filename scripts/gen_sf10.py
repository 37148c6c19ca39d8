#!/usr/bin/env python3
"""Generate a 10x scale-up of testdata-sf1/ into testdata-sf10/ — the
next decade of the measured-scaling ladder (r9 verdict #6): sf0.1 is the
oracle gate, sf1 was round 9's timing rung, sf10 (100x the gate) makes the
"survives 100x" plan arguments a two-decade measured curve for the heavy
keys.

Same construction discipline as gen_sf1.py (which see): key spaces shift
by copy*stride with stride = source cardinality bound, FKs shift with
their parents, timestamps get per-copy microsecond offsets so copies
aren't bit-identical, document copies keep token COUNTS but remap tokens
through a seeded hash (preserves length/Zipf structure WITHOUT planting
quadratic near-dup candidate growth), embeddings rotate + jitter (same
norm distribution, fresh neighbor structure). NOT oracle-checked — a
timing corpus only.

Usage: python3 scripts/gen_sf10.py [outdir]   (default testdata-sf10/)
"""
import os
import sys

import duckdb

COPIES = 10


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "testdata-sf1")
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(here, "testdata-sf10")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    # strides = source cardinality bound per key domain, computed from the
    # data (gen_sf1 hardcoded the sf0.1 bounds; at sf1 the domains differ)
    def stride(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    cust_s = stride("customer", "c_custkey")
    supp_s = stride("supplier", "s_suppkey")
    part_s = stride("part", "p_partkey")
    ord_s = stride("orders", "o_orderkey")
    evt_s = stride("events", "event_id")
    usr_s = stride("events", "user_id")
    doc_s = stride("documents", "doc_id")
    vec_s = stride("embeddings", "vec_id")

    def gen(table: str, sql_per_copy: str) -> None:
        selects = " UNION ALL ".join(
            sql_per_copy.format(i=i) for i in range(COPIES))
        con.execute(
            f"COPY ({selects}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied", flush=True)

    gen("customer", f"""
        SELECT c_custkey + {{i}} * {cust_s} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'""")
    gen("supplier", f"""
        SELECT s_suppkey + {{i}} * {supp_s} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}/supplier.parquet'""")
    gen("part", f"""
        SELECT p_partkey + {{i}} * {part_s} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet'""")
    gen("orders", f"""
        SELECT o_orderkey + {{i}} * {ord_s} AS o_orderkey,
               o_custkey + {{i}} * {cust_s} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate + INTERVAL ({{i}}) MICROSECOND
                 AS o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")
    gen("lineitem", f"""
        SELECT l_orderkey + {{i}} * {ord_s} AS l_orderkey,
               l_partkey + {{i}} * {part_s} AS l_partkey,
               l_suppkey + {{i}} * {supp_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus,
               l_shipdate + INTERVAL ({{i}}) MICROSECOND AS l_shipdate
        FROM '{src}/lineitem.parquet'""")
    gen("events", f"""
        SELECT event_id + {{i}} * {evt_s} AS event_id,
               ts + INTERVAL ({{i}}) MICROSECOND AS ts,
               user_id + {{i}} * {usr_s} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet'""")

    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(regexp_split_to_array(text, ' ')) AS w "
        f"FROM '{src}/documents.parquet' ORDER BY w").fetchall()]
    vlit = "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in vocab) + "]"
    gen("documents", f"""
        SELECT doc_id + {{i}} * {doc_s} AS doc_id,
               CASE WHEN {{i}} = 0 THEN text
                    ELSE array_to_string(list_transform(
                      regexp_split_to_array(text, ' '),
                      (w, p) -> ({vlit})[CAST(1 + abs(hash(doc_id, 10 + {{i}}, p, w))
                                         % {len(vocab)} AS BIGINT)]), ' ')
               END AS text,
               lang, source,
               CASE WHEN {{i}} = 0 THEN n_chars
                    ELSE length(array_to_string(list_transform(
                      regexp_split_to_array(text, ' '),
                      (w, p) -> ({vlit})[CAST(1 + abs(hash(doc_id, 10 + {{i}}, p, w))
                                         % {len(vocab)} AS BIGINT)]), ' '))
               END AS n_chars
        FROM '{src}/documents.parquet'""")

    gen("embeddings", f"""
        SELECT vec_id + {{i}} * {vec_s} AS vec_id,
               CAST(list_transform(range(1, 65), j ->
                 embedding[CAST(1 + ((j - 1 + 8 * {{i}}) % 64) AS BIGINT)]
                   + CAST((abs(hash(vec_id, 10 + {{i}}, j)) % 1000) AS FLOAT)
                     / 100000.0) AS FLOAT[]) AS embedding,
               label
        FROM '{src}/embeddings.parquet'""")


if __name__ == "__main__":
    main()
