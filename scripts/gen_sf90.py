#!/usr/bin/env python3
"""Generate the documents table at sf90 from testdata-sf30/ — the THIRD
decade rung, scoped to the lev family (r12 verdict item 2): sf30 showed
dedup_levenshtein_block at 7.18x / dedup_lev_recall at 6.00x for 3x data
because sub-cap blocks were still transiting the quadratic region; the
analytic ceiling (C(64,2) pairs per saturated block) predicts the ratio
falls back to ~3x once the 64-member cap saturates. sf90 is the
measurement that confirms (or refutes) the derived linear regime.

Only `documents` is generated — all three lev keys
(dedup_levenshtein_block, dedup_lev_recall, dedup_lev_cap_audit) read
levCorpus = documents alone. Same construction discipline as
gen_sf30.py: ids shift by copy*stride, token remap through a seeded hash
with seed base 70+i (disjoint from gen_sf10's 10+i and gen_sf30's 40+i,
so new copies are not near-dups of each other or their parents). NOT
oracle-checked — a timing corpus only.

r14: `--events` also generates events at sf90 (90M rows, gen_sf30.py's
exact events discipline — ids shift by copy*stride, per-copy microsecond
ts offsets) so the events-bearing heavy keys (q_gap_fill) get their third
decade rung from the same lineage.

Usage: python3 scripts/gen_sf90.py [outdir] [--events]
"""
import os
import sys

import duckdb

COPIES = 3


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "testdata-sf30")
    args = [a for a in sys.argv[1:] if a != "--events"]
    events = "--events" in sys.argv[1:]
    out = args[0] if args else os.path.join(here, "testdata-sf90")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    if events:
        evt_s = con.execute(
            f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
        usr_s = con.execute(
            f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
        eselects = " UNION ALL ".join(f"""
            SELECT event_id + {i} * {evt_s} AS event_id,
                   ts + INTERVAL ({i}) MICROSECOND AS ts,
                   user_id + {i} * {usr_s} AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet'""" for i in range(COPIES))
        con.execute(
            f"COPY ({eselects}) TO '{out}/events.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
        print(f"events: {n} rows", flush=True)

    doc_s = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(regexp_split_to_array(text, ' ')) AS w "
        f"FROM '{src}/documents.parquet' ORDER BY w").fetchall()]
    vlit = "[" + ", ".join(
        "'" + w.replace("'", "''") + "'" for w in vocab) + "]"
    selects = " UNION ALL ".join(f"""
        SELECT doc_id + {i} * {doc_s} AS doc_id,
               CASE WHEN {i} = 0 THEN text
                    ELSE array_to_string(list_transform(
                      regexp_split_to_array(text, ' '),
                      (w, p) -> ({vlit})[CAST(1 + abs(hash(doc_id, {70 + i}, p, w))
                                         % {len(vocab)} AS BIGINT)]), ' ')
               END AS text,
               lang, source,
               CASE WHEN {i} = 0 THEN n_chars
                    ELSE length(array_to_string(list_transform(
                      regexp_split_to_array(text, ' '),
                      (w, p) -> ({vlit})[CAST(1 + abs(hash(doc_id, {70 + i}, p, w))
                                         % {len(vocab)} AS BIGINT)]), ' '))
               END AS n_chars
        FROM '{src}/documents.parquet'""" for i in range(COPIES))
    con.execute(
        f"COPY ({selects}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows", flush=True)


if __name__ == "__main__":
    main()
