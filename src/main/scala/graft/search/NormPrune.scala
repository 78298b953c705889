package graft.search

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Norm-bound pruning for EXACT kNN — the triangle-inequality zone map
  * behind `norm_pruned_search` (FEXIPRO-style norm filtering, Li et al.
  * SIGMOD 2017): ‖x−q‖² ≥ (‖x‖−‖q‖)², so a τ bound on the k-th-nearest
  * distance shrinks the scan to the norm band [‖q‖−√τ, ‖q‖+√τ] with NO
  * recall loss. The stored form is norm-sorted, so the band is a pushed
  * range filter → parquet row-group skipping at scale. */
object NormPrune {
  /** The stored layout: corpus + rounded norm column, range-partitioned
    * and sorted by norm (min/max row-group stats = the zone map). */
  def normTable(df: DataFrame, idCol: String, vecCol: String,
                partitions: Int = 8): DataFrame =
    df.select(col(idCol), col(vecCol),
        round(sqrt(aggregate(col(vecCol), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 4)
          .as("norm"))
      .repartitionByRange(partitions, col("norm"))
      .sortWithinPartitions(col("norm"))

  /** ‖q‖ with the same arithmetic/rounding as [[normTable]]'s column. */
  def queryNorm(query: Array[Float]): Double =
    BigDecimal(math.sqrt(query.map(v => v.toDouble * v.toDouble).sum))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Phase-1 τ: the max exact distance among the k nearest-BY-NORM rows
    * (real distances ⇒ a valid upper bound on the true k-th distance).
    * One bounded top-k on the sort key + a 1-row aggregate. An EMPTY
    * table has no seeds to bound with — τ = +∞ (a vacuous band keeping
    * everything, which is then also empty) instead of an NPE. */
  def tauBound(tab: DataFrame, idCol: String, vecCol: String,
               query: Array[Float], k: Int): Double = {
    val qn = queryNorm(query)
    val r = tab.orderBy(abs(col("norm") - qn).asc, col(idCol).asc)
      .limit(k)
      .select(round(VectorFunctions.l2Sq(col(vecCol),
        typedlit(query.toSeq)), 4).as("d"))
      .agg(max(col("d"))).collect()(0)
    if (r.isNullAt(0)) Double.PositiveInfinity else r.getDouble(0)
  }

  /** The τ-band slice of the stored table — literal bounds, pushed to
    * the scan. τ itself is a ROUNDED distance (4 decimals, half-up), so
    * it may under-report the true k-th distance² by up to 5e-5; the
    * radius uses √(τ + 5e-5) so the bound stays a true upper bound
    * (without this, a corpus of near-duplicates where every seed
    * distance rounds to 0 would shrink the band below genuinely closer
    * vectors and break the exactness guarantee). `slack` then absorbs
    * the 4-decimal rounding of the norm column itself (≤ 5e-5 per
    * side). */
  def band(tab: DataFrame, query: Array[Float], tau: Double,
           slack: Double = 2e-4): DataFrame = {
    val qn = queryNorm(query)
    val r = math.sqrt(tau + 5e-5)
    val (lo, hi) = (qn - r - slack, qn + r + slack)
    tab.where(col("norm") >= lo && col("norm") <= hi)
  }

  /** Exact top-k over the pruned band: (id, norm, distance). */
  def search(tab: DataFrame, idCol: String, vecCol: String,
             query: Array[Float], k: Int): DataFrame = {
    val tau = tauBound(tab, idCol, vecCol, query, k)
    band(tab, query, tau)
      .withColumn("distance", round(VectorFunctions.l2Sq(col(vecCol),
        typedlit(query.toSeq)), 4))
      .select(col(idCol), col("norm"), col("distance"))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
  }

  // --- MIPS (maximum inner product) pruning — the OTHER norm bound
  // (Cauchy–Schwarz: ip(x,q) ≤ ‖x‖·‖q‖, the FEXIPRO/LEMP discipline
  // for recommender retrieval): once any k inner products bound the
  // k-th-best by τ, every vector with ‖x‖ < τ/‖q‖ is provably out.
  // On a norm-SORTED layout the cut is a one-sided pushed range
  // filter, and the natural seeds are simply the k LARGEST-norm rows
  // (the top of the sort order — no distance arithmetic to find them).

  /** Phase-1 τ for MIPS: the k-th best exact inner product among the
    * k·`seedFactor` largest-norm rows (real inner products ⇒ a valid
    * lower bound on the true k-th-best; over-seeding matters because a
    * large norm with an unlucky direction gives a weak bound — 4k
    * seeds make τ the k-th best of a small panel instead of the
    * MINIMUM of exactly k rows). */
  def mipsTauBound(tab: DataFrame, idCol: String, vecCol: String,
                   query: Array[Float], k: Int,
                   seedFactor: Int = 4): Double = {
    val seeds = tab.orderBy(col("norm").desc, col(idCol).asc)
      .limit(k * seedFactor)
      .select(round(VectorFunctions.dot(col(vecCol),
        typedlit(query.toSeq)), 4).as("ip"))
      .orderBy(col("ip").desc)
      .collect().map(_.getDouble(0))
    // no rows ⇒ no bound: τ = −∞ makes the cut vacuous (keep all of the
    // — equally empty — table) instead of indexing seeds(-1)
    if (seeds.isEmpty) Double.NegativeInfinity
    else seeds(math.min(k, seeds.length) - 1)
  }

  /** The MIPS norm cut: keep rows with ‖x‖ ≥ (τ − 5e-5)/‖q‖ − slack.
    * τ is a ROUNDED inner product (may over-report the true k-th best
    * by ≤ 5e-5, hence the deflation); a non-positive deflated τ keeps
    * everything (the bound is vacuous — correct, no pruning). */
  def mipsCut(tab: DataFrame, query: Array[Float], tau: Double,
              slack: Double = 2e-4): DataFrame = {
    // UNROUNDED ‖q‖ here (unlike the L2 band, whose bound compares to
    // the rounded norm column on BOTH sides): dividing by a rounded-
    // down qn would tighten the cut by ~τ·5e-5/qn², which for large
    // norms exceeds the slack; the raw double is what the oracle
    // mirrors
    val qn = math.sqrt(query.map(v => v.toDouble * v.toDouble).sum)
    require(qn > 0, "query vector must be non-zero")
    val lo = (tau - 5e-5) / qn - slack
    if (lo <= 0) tab else tab.where(col("norm") >= lo)
  }

  /** Exact MIPS top-k over the pruned slice: (id, norm, ip). */
  def mipsSearch(tab: DataFrame, idCol: String, vecCol: String,
                 query: Array[Float], k: Int): DataFrame = {
    val tau = mipsTauBound(tab, idCol, vecCol, query, k)
    mipsCut(tab, query, tau)
      .withColumn("ip", round(VectorFunctions.dot(col(vecCol),
        typedlit(query.toSeq)), 4))
      .select(col(idCol), col("norm"), col("ip"))
      .orderBy(col("ip").desc, col(idCol).asc)
      .limit(k)
  }
}
