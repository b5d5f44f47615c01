WITH img AS (
  SELECT doc_id, CAST(n_chars % 64 + 8 AS INTEGER) AS w,
         CAST(n_chars % 48 + 6 AS INTEGER) AS h
  FROM documents WHERE doc_id % 3 = 0),
px AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM img),
pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px),
keys AS (
  SELECT doc_id, w, h,
    CAST(doc_id AS VARCHAR) || ':' || CAST(x AS VARCHAR) || ':'
      || CAST(y AS VARCHAR) AS key
  FROM pxy),
kfnv AS (
  SELECT doc_id, w, h,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        list_transform(range(1, length(key)+1),
          i -> CAST(unicode(substr(key, i, 1)) AS HUGEINT))),
      (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                 * 1099511628211) % 18446744073709551616) AS h0
  FROM keys),
k1 AS (SELECT doc_id, w, h,
  CAST(xor(CAST(h0 AS UBIGINT), CAST(h0 AS UBIGINT) // 8589934592) AS HUGEINT) AS f1
  FROM kfnv),
k2 AS (SELECT doc_id, w, h,
  (((f1 * (18397679294719823053 // 4294967296)) % 4294967296) * 4294967296
   + f1 * (18397679294719823053 % 4294967296)) % 18446744073709551616 AS f2
  FROM k1),
k3 AS (SELECT doc_id, w, h,
  CAST(xor(CAST(f2 AS UBIGINT), CAST(f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS f3
  FROM k2),
k4 AS (SELECT doc_id, w, h,
  (((f3 * (14181476777654086739 // 4294967296)) % 4294967296) * 4294967296
   + f3 * (14181476777654086739 % 4294967296)) % 18446744073709551616 AS f4
  FROM k3),
kpx AS (SELECT doc_id, w, h,
  xor(CAST(f4 AS UBIGINT), CAST(f4 AS UBIGINT) // 8589934592) % 16777216 AS p
  FROM k4),
isum AS (
  SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
    CAST(SUM(p // 65536 + (p // 256) % 256 + p % 256) AS BIGINT) AS psum
  FROM kpx GROUP BY doc_id),
media AS (
  SELECT doc_id, 'image' AS kind, w, h, psum FROM isum
  UNION ALL
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
    0 AS w, 0 AS h, CAST(-1 AS BIGINT) AS psum
  FROM documents WHERE doc_id % 3 <> 0),
descr AS (
  SELECT doc_id, kind, w, h, psum,
    kind || ':' || CAST(doc_id AS VARCHAR) || ':' || CAST(w AS VARCHAR)
      || ':' || CAST(h AS VARCHAR) || ':' || CAST(psum AS VARCHAR) AS d
  FROM media),
dims AS (SELECT doc_id, kind, w, h, psum, d, unnest(range(0, 64)) AS i
  FROM descr),
sm AS (SELECT doc_id, kind, w, h, psum, d, i,
  (CAST(i AS HUGEINT) * 11400714819323198485 + 2685821657736338717)
    % 18446744073709551616 AS u0
  FROM dims),
s1 AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(u0 AS UBIGINT), CAST(u0 AS UBIGINT) // 8589934592) AS HUGEINT) AS g1
  FROM sm),
s2 AS (SELECT doc_id, kind, w, h, psum, d, i,
  (((g1 * (18397679294719823053 // 4294967296)) % 4294967296) * 4294967296
   + g1 * (18397679294719823053 % 4294967296)) % 18446744073709551616 AS g2
  FROM s1),
s3 AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(g2 AS UBIGINT), CAST(g2 AS UBIGINT) // 8589934592) AS HUGEINT) AS g3
  FROM s2),
s4 AS (SELECT doc_id, kind, w, h, psum, d, i,
  (((g3 * (14181476777654086739 // 4294967296)) % 4294967296) * 4294967296
   + g3 * (14181476777654086739 % 4294967296)) % 18446744073709551616 AS g4
  FROM s3),
s5 AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(g4 AS UBIGINT), CAST(g4 AS UBIGINT) // 8589934592) AS HUGEINT) AS gs
  FROM s4),
init AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(14695981039346656037 AS UBIGINT), CAST(gs AS UBIGINT)) AS HUGEINT) AS b0
  FROM s5),
body AS (
  SELECT doc_id, kind, w, h, psum, i,
    list_reduce(
      list_prepend(b0,
        list_transform(range(1, length(d)+1),
          c -> CAST(unicode(substr(d, c, 1)) AS HUGEINT))),
      (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                 * 1099511628211) % 18446744073709551616) AS hb
  FROM init),
b1 AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(xor(CAST(hb AS UBIGINT), CAST(hb AS UBIGINT) // 8589934592) AS HUGEINT) AS e1
  FROM body),
b2 AS (SELECT doc_id, kind, w, h, psum, i,
  (((e1 * (18397679294719823053 // 4294967296)) % 4294967296) * 4294967296
   + e1 * (18397679294719823053 % 4294967296)) % 18446744073709551616 AS e2
  FROM b1),
b3 AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(xor(CAST(e2 AS UBIGINT), CAST(e2 AS UBIGINT) // 8589934592) AS HUGEINT) AS e3
  FROM b2),
b4 AS (SELECT doc_id, kind, w, h, psum, i,
  (((e3 * (14181476777654086739 // 4294967296)) % 4294967296) * 4294967296
   + e3 * (14181476777654086739 % 4294967296)) % 18446744073709551616 AS e4
  FROM b3),
b5 AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(xor(CAST(e4 AS UBIGINT), CAST(e4 AS UBIGINT) // 8589934592) AS HUGEINT) AS hf
  FROM b4),
sg AS (SELECT doc_id, kind, w, h, psum, i,
  CASE WHEN hf >= 9223372036854775808 THEN hf - 18446744073709551616
       ELSE hf END AS hs
  FROM b5),
vals AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(CAST(CAST(hs AS DOUBLE) / 9223372036854775807 AS FLOAT) AS DOUBLE) AS v
  FROM sg),
norm2 AS (
  SELECT doc_id, kind, w, h, psum,
    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(v * v ORDER BY i)),
      (a, b) -> a + b) AS n2
  FROM vals GROUP BY doc_id, kind, w, h, psum)
SELECT doc_id AS media_id, kind, w AS width, h AS height,
  psum AS pixel_sum, n2 AS embedding_norm2
FROM norm2 ORDER BY media_id
