#!/usr/bin/env python3
"""Generate the committed oracle fixtures for the 3 queries DuckDB cannot
compute natively (deflate, PNG pixel decode, aHash). Each fixture is an
INDEPENDENT re-computation in CPython — a different implementation stack
from the JVM code under test:

- deflate.parquet   (text_md5, gz_len): zlib.compress(level=6) over every
  distinct document text across all SFs plus the planted boilerplate
  string. CPython's zlib and OpenJDK's Deflater(6, nowrap=false) are the
  same DEFLATE algorithm in two independent bindings; byte-identity was
  verified empirically (scripts history). Keyed by content md5 so the
  fixture survives doc_id reshuffles; a REGENERATED testdata corpus needs
  a re-run of this script (one command, below).
- pixels.parquet    (doc_id, width, height, out_w, out_h, pixel_md5,
  decodable): the multimodal synth-image pattern is closed-form in
  (x, y, doc_id) (ext/Multimodal.scala synthRealImageVariant), so the
  expected post-ImageIO-decode + nearest-neighbor-resize raster is
  re-derived here WITHOUT any PNG: if the JVM's encode→decode round-trip
  or the resize arithmetic drifts, the md5s diverge. Generated for
  doc_id 0..99999 (20x the largest SF) so a larger regenerated corpus
  still joins fully.
- phash.parquet     (doc_id, h_base, dist_up2x, dist_bright, near_up2x,
  near_bright): same closed-form replay for the aHash exhibit's three
  variants (base / 2x NN upscale / +8 red shift), doc_id % 10 == 0.

Usage: python3 scripts/gen_oracle_fixtures.py   (writes oracle_fixtures/)
"""
import glob
import hashlib
import os
import zlib

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "oracle_fixtures")
BOILER = " ".join(["boiler plate row"] * 40)
MAX_DOC_ID = 100000


def synth_pixel(doc_id: int, x: int, y: int, scale: int, red_off: int):
    bx, by = x // scale, y // scale
    r = min(255, (bx * 31 + doc_id) % 256 + red_off)
    g = (by * 17 + doc_id * 3) % 256
    b = (bx * by + doc_id * 7) % 256
    return r, g, b


def pixel_meta(doc_id: int, max_dim: int = 8):
    w, h = doc_id % 13 + 4, doc_id % 11 + 4
    if max(w, h) > max_dim:
        if w >= h:
            ow, oh = max_dim, max(1, h * max_dim // w)
        else:
            ow, oh = max(1, w * max_dim // h), max_dim
    else:
        ow, oh = w, h
    md = hashlib.md5()
    for y in range(oh):
        for x in range(ow):
            md.update(bytes(synth_pixel(doc_id, x * w // ow, y * h // oh, 1, 0)))
    return (doc_id, w, h, ow, oh, md.hexdigest(), True)


def ahash(doc_id: int, scale: int, red_off: int, dim: int = 8) -> int:
    w, h = (doc_id % 13 + 4) * scale, (doc_id % 11 + 4) * scale
    luma, total = [], 0
    for y in range(dim):
        for x in range(dim):
            r, g, b = synth_pixel(doc_id, x * w // dim, y * h // dim, scale, red_off)
            l = (299 * r + 587 * g + 114 * b) // 1000
            luma.append(l)
            total += l
    mean = total // (dim * dim)
    bits = 0
    for i, l in enumerate(luma):
        if l > mean:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # two's-complement int64


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    texts = {BOILER}
    for p in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        for (t,) in con.execute(f"SELECT DISTINCT text FROM '{p}'").fetchall():
            if t is not None:
                texts.add(t)
    deflate_rows = sorted(
        (hashlib.md5(t.encode()).hexdigest(), len(zlib.compress(t.encode(), 6)))
        for t in texts)
    con.execute("CREATE TABLE deflate (text_md5 VARCHAR, gz_len BIGINT)")
    con.executemany("INSERT INTO deflate VALUES (?, ?)", deflate_rows)
    con.execute(f"COPY deflate TO '{OUT}/deflate.parquet' (FORMAT PARQUET)")

    con.execute("CREATE TABLE pixels (doc_id BIGINT, width BIGINT, height BIGINT, "
                "out_w BIGINT, out_h BIGINT, pixel_md5 VARCHAR, decodable BOOLEAN)")
    con.executemany("INSERT INTO pixels VALUES (?, ?, ?, ?, ?, ?, ?)",
                    [pixel_meta(i) for i in range(MAX_DOC_ID)])
    con.execute(f"COPY pixels TO '{OUT}/pixels.parquet' (FORMAT PARQUET)")

    phash_rows = []
    for i in range(0, MAX_DOC_ID, 10):
        base, up2x, bright = ahash(i, 1, 0), ahash(i, 2, 0), ahash(i, 1, 8)
        d_up = bin((base ^ up2x) & ((1 << 64) - 1)).count("1")
        d_br = bin((base ^ bright) & ((1 << 64) - 1)).count("1")
        phash_rows.append((i, base, d_up, d_br, d_up <= 10, d_br <= 10))
    con.execute("CREATE TABLE phash (doc_id BIGINT, h_base BIGINT, "
                "dist_up2x BIGINT, dist_bright BIGINT, "
                "near_up2x BOOLEAN, near_bright BOOLEAN)")
    con.executemany("INSERT INTO phash VALUES (?, ?, ?, ?, ?, ?)", phash_rows)
    con.execute(f"COPY phash TO '{OUT}/phash.parquet' (FORMAT PARQUET)")

    for f in ("deflate", "pixels", "phash"):
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{f}.parquet'").fetchone()[0]
        print(f"{f}.parquet: {n} rows")


if __name__ == "__main__":
    main()
