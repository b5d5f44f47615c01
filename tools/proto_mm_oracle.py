#!/usr/bin/env python3
"""Prototype the mm_feature_extract DuckDB oracle against a pure-Python
replica of the Scala pipeline (Fnv seeded hash + fmix + float32 norm).
Dev tool only. Usage: python3 tools/proto_mm_oracle.py [sfDir]
"""
import sys
import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
M64 = (1 << 64) - 1


def fmix(h):
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & M64
    h ^= h >> 33
    return h


def fnv64(data: bytes, seed=None):
    h = 0xCBF29CE484222325
    if seed is not None:
        h ^= fmix((seed * 0x9E3779B97F4A7C15 + 0x2545F4914F6CDD1D) & M64)
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & M64
    return fmix(h)


def signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def expected(doc_id, n_chars):
    kind = ["image", "audio", "video"][doc_id % 3]
    if kind == "image":
        w, h = n_chars % 64 + 8, n_chars % 48 + 6
        psum = 0
        for x in range(w):
            for y in range(h):
                p = fnv64(f"{doc_id}:{x}:{y}".encode()) & 0xFFFFFF
                psum += (p >> 16) + ((p >> 8) & 0xFF) + (p & 0xFF)
    else:
        w, h, psum = 0, 0, -1
    desc = f"{kind}:{doc_id}:{w}:{h}:{psum}".encode()
    n2 = 0.0
    for i in range(64):
        hs = signed(fnv64(desc, seed=i))
        v = float(np.float32(float(hs) / float(9223372036854775807)))
        n2 = n2 + v * v
    return doc_id, kind, w, h, psum, n2


SQL = open("tools/mm_feature_oracle.sql").read()

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
docs = con.execute(
    "SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 12").fetchall()
got = {r[0]: r for r in con.execute(SQL).fetchall()}
n_bad = 0
for doc_id, n_chars in docs:
    exp = expected(doc_id, n_chars)
    g = got.get(doc_id)
    ok = g is not None and tuple(g[:5]) == exp[:5] and g[5] == exp[5]
    if not ok:
        n_bad += 1
        print(f"MISMATCH doc {doc_id}: expected {exp}  got {g}")
print(f"{len(docs) - n_bad}/{len(docs)} rows match; total oracle rows: {len(got)}")
