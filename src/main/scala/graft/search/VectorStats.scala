package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-level vector statistics computed WITHOUT materializing pairs.
  *
  * [[meanPairwiseCosine]] uses the moment identity: with uᵢ = vᵢ/‖vᵢ‖,
  * `Σ_{i≠j} uᵢ·uⱼ = ‖Σᵢ uᵢ‖² − n` (expand the square; the diagonal terms
  * are each 1). The exact mean over all n·(n−1) ordered pairs — the
  * number a naive self-join needs O(n²) distance evaluations for — falls
  * out of ONE linear scan: per-dimension sums (map-side combined, `dim`
  * rows shuffle) and a `dim`-row reduce. At 10⁸ vectors the naive form
  * is 10¹⁶ pairs; this is one pass.
  *
  * The curation use: mean pairwise cosine is the corpus REDUNDANCY
  * number — run it before and after a SemDeDup/near-dup pass
  * ([[graft.dedup.SemanticDedup]]) to verify the pass actually
  * decorrelated the corpus instead of just shrinking it. */
object VectorStats {
  /** Unit-norm denominator, NULL-safe for the caller's filter. */
  def normCol(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** One row: (n, mean_pairwise_cosine) over all ordered pairs of
    * distinct indices, zero vectors excluded (no direction ⇒ no cosine).
    * `roundTo` decimals with a +1e-12 nudge for cross-engine hashing. */
  def meanPairwiseCosine(df: DataFrame, vecCol: String,
                         roundTo: Int = 4): DataFrame = {
    val nrm = df.select(col(vecCol), normCol(col(vecCol)).as("nv"))
      .where(col("nv") > 0)
    val sums = nrm
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")), col("nv"))
      .groupBy(col("pos"))
      .agg(sum(col("v").cast("double") / col("nv")).as("sd"))
    val s2 = sums.agg(sum(col("sd") * col("sd")).as("s2"))
    val n = nrm.agg(count(lit(1)).as("n"))
    // n ≤ 1 has no pairs: NULL mean, not a 0/0 NaN that would poison a
    // downstream comparison silently
    s2.crossJoin(n).select(col("n"),
      when(col("n") > 1,
        round((col("s2") - col("n")) / (col("n") * (col("n") - lit(1)))
          + lit(1e-12), roundTo)).as("mean_pairwise_cosine"))
  }
}
