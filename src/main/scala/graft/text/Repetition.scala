package graft.text

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Gopher-style repetition signals for training-data quality filtering
  * (Rae et al. 2021 §A1.1 "repetitious text"; C4 uses similar line-level
  * rules). A document whose n-grams or single tokens repeat far above the
  * corpus norm is boilerplate/spam with high probability and is dropped
  * before training.
  *
  * Signals per document:
  *   - `dup_2gram_frac` / `dup_3gram_frac`: 1 − distinct-n-grams ∕
  *     total-n-grams (0 when the doc has no n-grams). Distinct counts come
  *     from the codegen'd [[graft.functions.TokenShingles]] kernel — one
  *     compiled pass per row, no interpreted higher-order functions.
  *   - `top_token_frac`: occurrences of the modal token ∕ total tokens
  *     (Gopher's "fraction in most common word").
  *
  * Scale shape: the n-gram side is pure per-row map work; the modal-token
  * side is two hash aggregates keyed by (doc, token) then doc — per-key
  * state is bounded by one document's vocabulary — and the final join is
  * an id-keyed shuffle. Nothing is broadcast, nothing is O(corpus) on any
  * single node.
  */
object Repetition {
  /** Keep thresholds. Gopher's production cuts are ~0.2 (dup 2-gram),
    * ~0.18 (dup 3-gram), ~0.2 (top token); the synthetic fixture corpus
    * is far less repetitive than web text (medians 0.028 / 0.0 / 0.093),
    * so these are tightened to the same percentile band to make the keep
    * flag exercise both branches on the fixtures. The thresholds are part
    * of the pinned, oracle-checked semantics. */
  val MaxDup2: Double = 0.03
  val MaxDup3: Double = 0.01
  val MaxTopToken: Double = 0.10

  private def dupFrac(distinct: Column, total: Column): Column =
    when(total <= 0L, lit(0.0))
      .otherwise(lit(1.0) - distinct.cast("double") / total.cast("double"))

  /** Per-doc repetition stats + keep flag. Output columns: id, n_tokens,
    * dup_2gram_frac, dup_3gram_frac, top_token_frac, keep. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.wsTokens(col(textCol))
    val perRow = df.select(
      col(idCol).as("id"),
      size(toks).cast("long").as("n_tokens"),
      size(TextFunctions.tokenShingles(col(textCol), 2)).cast("long").as("dist2"),
      size(TextFunctions.tokenShingles(col(textCol), 3)).cast("long").as("dist3"))
    val topTok = df
      .select(col(idCol).as("id"), explode(toks).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top_cnt"))
    // +1e-9: deterministic half tie-break for small-denominator rational
    // fractions (see TextAnalysis.qualityScore's scaladoc)
    val dup2 = round(dupFrac(col("dist2"), col("n_tokens") - 1L) + lit(1e-9), 4)
    val dup3 = round(dupFrac(col("dist3"), col("n_tokens") - 2L) + lit(1e-9), 4)
    val topFrac = round(col("top_cnt").cast("double") / col("n_tokens")
      + lit(1e-9), 4)
    perRow.join(topTok, "id")
      .select(
        col("id"),
        col("n_tokens"),
        dup2.as("dup_2gram_frac"),
        dup3.as("dup_3gram_frac"),
        topFrac.as("top_token_frac"))
      .withColumn("keep",
        col("dup_2gram_frac") <= MaxDup2 &&
          col("dup_3gram_frac") <= MaxDup3 &&
          col("top_token_frac") <= MaxTopToken)
      .withColumnRenamed("id", idCol)
  }
}
