package graft

import graft.text.Keywords

/** SQL-text builders for DuckDB oracles that mirror the HashingEmbedder
  * pipeline (graft.ingest.HashingEmbedder): bucket = first 4 md5 bytes of
  * the lowercased whitespace token, mod dim; weight = count / L2-norm,
  * materialized at FLOAT precision exactly like the Spark side, so
  * distances agree to well below the 4-decimal rounding both engines
  * apply. L2² between unit-ish sparse vectors is computed relationally:
  * |a|² + |b|² − 2·(a·b) with the dot product as a bucket equi-join —
  * no dense 64-wide arrays ever built in SQL.
  */
object DuckOracle {
  val stopWordsSqlList: String =
    Keywords.StopWords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** First 4 md5 bytes (big-endian) as an integer: Horner over the first
    * 8 hex nibbles of column `m`. */
  val md5Bucket32: String =
    (1 to 8).map(i => s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)")
      .mkString("((((((((", ") * 16 + ", ")")

  /** CTEs `{p}cnt/{p}w/{p}n2` computing hashing-embedder bucket weights
    * for `src` (a SELECT yielding columns `id, text`). */
  def hashEmbedCtes(p: String, src: String, dim: Int = 64): String = s"""
      ${p}cnt AS (
        SELECT id, bucket, CAST(count(*) AS DOUBLE) AS c
        FROM (SELECT id, CAST($md5Bucket32 % $dim AS BIGINT) AS bucket
              FROM (SELECT id, md5(t) AS m
                    FROM (SELECT id,
                            unnest(list_filter(string_split_regex(lower(text),
                              '\\s+'), x -> x != '')) AS t
                          FROM ($src))))
        GROUP BY 1, 2),
      ${p}w AS (
        SELECT id, bucket,
               CAST(c / sqrt(sum(c * c) OVER (PARTITION BY id)) AS FLOAT) AS w
        FROM ${p}cnt),
      ${p}n2 AS (
        -- LEFT JOIN from ALL source ids: a zero-token document embeds as
        -- the zero vector on the Spark side (n2 = 0, distance = |q|²),
        -- so it must rank here too, not silently drop out of the CTE
        SELECT s.id, coalesce(t.n2, 0) AS n2
        FROM (SELECT id FROM ($src)) s
        LEFT JOIN (SELECT id, sum(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)) AS n2
                   FROM ${p}w GROUP BY id) t USING (id))"""

  /** CTE `{out}` = L2² distance of every (corpus `c`, query `q`) pair:
    * columns (id, qid, distance), distance unrounded (rank on it, round
    * only for output — exactly what the Spark side does). */
  def l2DistCte(out: String, c: String, q: String): String = s"""
      $out AS (
        SELECT cn.id AS id, qn.id AS qid,
               cn.n2 + qn.n2 - 2 * coalesce(j.dot, 0) AS distance
        FROM ${c}n2 cn CROSS JOIN ${q}n2 qn
        LEFT JOIN (SELECT a.id AS id, b.id AS qid,
                          sum(CAST(a.w AS DOUBLE) * CAST(b.w AS DOUBLE)) AS dot
                   FROM ${c}w a JOIN ${q}w b USING (bucket)
                   GROUP BY 1, 2) j
          ON j.id = cn.id AND j.qid = qn.id)"""

  /** CTE `kws` = (id BIGINT 0-based, text) — the reference keyword
    * extraction (top-3, length-desc stable) over the literal `queryText`. */
  def keywordsCte(queryText: String): String = s"""
      ktoks AS (
        SELECT unnest(range(1, len(t)+1)) AS tok_idx, unnest(t) AS keyword
        FROM (SELECT regexp_extract_all('$queryText',
                '[一-龥]{2,}|[a-zA-Z]{3,}') AS t)),
      kf AS (SELECT * FROM ktoks WHERE keyword NOT IN $stopWordsSqlList),
      kr AS (SELECT keyword,
                    CAST(row_number() OVER (ORDER BY length(keyword) DESC,
                      tok_idx ASC) AS BIGINT) AS kw_rank
             FROM kf),
      kws AS (SELECT kw_rank - 1 AS id, keyword AS text FROM kr
              WHERE kw_rank <= 3)"""

  /** CTE `chq` = (id BIGINT 1-based chunk_rank, text) — the reference
    * chunk split (punctuation split, trim, strict len>5, first 2) of the
    * literal `queryText`. */
  def chunksCte(queryText: String): String = s"""
      rawch AS (
        SELECT unnest(range(1, len(a)+1)) AS idx, unnest(a) AS raw
        FROM (SELECT string_split_regex('$queryText',
                '[，。！？；:,\\.!?;]') AS a)),
      chf AS (SELECT idx, trim(raw) AS chunk FROM rawch
              WHERE length(trim(raw)) > 5),
      chr AS (SELECT chunk,
                     CAST(row_number() OVER (ORDER BY idx ASC) AS BIGINT)
                       AS chunk_rank
              FROM chf),
      chq AS (SELECT chunk_rank AS id, chunk AS text FROM chr
              WHERE chunk_rank <= 2)"""
}
