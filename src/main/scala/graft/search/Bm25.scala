package graft.search

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Okapi BM25 keyword scoring + reciprocal-rank fusion — the "hybrid
  * search" surface modern vector stores pair with ANN retrieval (dense
  * scores and lexical scores fused by rank, not by incomparable raw
  * values).
  *
  * Scale shape: tokens are filtered to the QUERY terms before any
  * aggregate, so tf/df state is O(query terms × matching docs), never
  * corpus-wide; corpus stats (N, avg doc length) are one aggregate row
  * broadcast into the score join. avgdl is computed as exact-long token
  * sum ÷ count — not a floating avg(), whose summation order would
  * differ between engines/runs and flip rounded scores. Scores are
  * rounded to 4 decimals BEFORE ranking so cross-engine libm (ln) ulp
  * differences cannot reorder ranks (ties break by id).
  */
object Bm25 {
  /** Per-doc BM25 over whitespace tokens: (id, bm25), docs with no query
    * term absent. IDF is the standard smoothed ln((N-df+0.5)/(df+0.5)+1). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    // empty tokens (leading-whitespace split artifacts) are excluded
    // from BOTH tf and dl, so dl is a true term count
    scoreTokens(docs, idCol,
      filter(split(col(textCol), "\\s+"), t => length(t) > 0), terms, k1, b)

  /** [[score]] over an arbitrary token-array Column — the seam a
    * configurable analysis chain ([[graft.text.Analyzer]]) plugs into:
    * dl/avgdl/tf/df all derive from the SAME analyzed tokens, so the
    * scoring statistics see exactly what the tokenizer kept. */
  def scoreTokens(docs: DataFrame, idCol: String, toks: Column,
                  terms: Seq[String], k1: Double = 1.2,
                  b: Double = 0.75): DataFrame = {
    val tf = docs.select(col(idCol).as("id"), explode(toks).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_"))
    val dlen = docs.select(col(idCol).as("id"),
      size(toks).cast("double").as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(toks).cast("long")).cast("double")
        / count(lit(1)).cast("double")).as("avgdl"))
    val idf = log((col("n_docs") - col("df_") + 0.5) / (col("df_") + 0.5) + 1.0)
    tf.join(dfreq, "term")
      .join(dlen, "id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        idf * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("contrib")), 4).as("bm25"))
  }

  /** Rank the top `n` rows of `scored` by (scoreCol dir, id asc); the
    * window runs AFTER the limit, over n rows — never corpus-wide. */
  def topRanks(scored: DataFrame, scoreCol: String, n: Int,
               ascending: Boolean, rankCol: String): DataFrame = {
    val key = if (ascending) col(scoreCol).asc else col(scoreCol).desc
    scored.orderBy(key, col("id").asc).limit(n)
      .withColumn(rankCol,
        row_number().over(Window.orderBy(key, col("id").asc)).cast("long"))
      .select(col("id"), col(rankCol))
  }

  /** Reciprocal-rank fusion of two rank lists: Σ 1/(k + rank) over the
    * lists containing the doc. */
  def rrfFuse(a: DataFrame, rankA: String, b: DataFrame, rankB: String,
              k: Int = 60): DataFrame =
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        round(
          coalesce(lit(1.0) / (lit(k.toDouble) + col(rankA)), lit(0.0))
            + coalesce(lit(1.0) / (lit(k.toDouble) + col(rankB)), lit(0.0)),
          6).as("rrf"),
        col(rankA), col(rankB))

  /** Milvus's L2 score normalization for WeightedRanker fusion
    * (documented arctan mapping: distance 0 → 1.0, large distances →
    * 0): `1 − 2·atan(√d)/π`. */
  def normalizeL2(d: Column): Column =
    lit(1.0) - lit(2.0) * atan(sqrt(d)) / lit(math.Pi)

  /** Milvus's IP/COSINE score normalization for WeightedRanker fusion:
    * `(1 + s) / 2` — for scores already in [−1, 1] (cosine, or IP over
    * unit-normalized vectors, the Milvus contract). For UNBOUNDED
    * similarity scores use [[normalizeUnbounded]] instead: (1+s)/2
    * exceeds 1 there and the fusion weights stop bounding leg
    * influence. */
  def normalizeIp(s: Column): Column = (lit(1.0) + s) / lit(2.0)

  /** Arctan normalization for UNBOUNDED non-negative similarity scores
    * (raw inner products, BM25, sparse dot products): `2·atan(s)/π`
    * maps [0, ∞) monotonically onto [0, 1) — the same arctan squash
    * Milvus documents for its unbounded-metric normalization, so a
    * weighted leg can never exceed its weight. */
  def normalizeUnbounded(s: Column): Column =
    lit(2.0) * atan(s) / lit(math.Pi)

  /** WEIGHTED score fusion of two scored lists — Milvus's
    * `WeightedRanker` (the RRFRanker's sibling in the 2.4 hybrid-search
    * API): each leg's raw metric score is first normalized to [0, 1]
    * with the metric's mapping ([[normalizeL2]] / [[normalizeIp]],
    * applied by the CALLER so legs with different metrics compose),
    * then fused as `Σ wᵢ · normalized_scoreᵢ`, a doc missing from a
    * leg contributing 0 for it. Unlike RRF this preserves score
    * MAGNITUDE (a dominant leg hit outranks two mediocre ones), which
    * is why Milvus offers both. Plan: one full-outer equi-join of two
    * k-bounded lists — no corpus work. */
  def weightedFuse(a: DataFrame, scoreA: String, wA: Double,
                   b: DataFrame, scoreB: String, wB: Double): DataFrame =
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        round(coalesce(col(scoreA) * wA, lit(0.0))
          + coalesce(col(scoreB) * wB, lit(0.0)), 6).as("fused"),
        col(scoreA), col(scoreB))
}
