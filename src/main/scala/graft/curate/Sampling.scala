package graft.curate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling / dataset-split operators for training-data
  * curation (north-star surface, BASELINE.json).
  *
  * All assignment is a pure function of the row id via md5 — NOT
  * `rand()`/`sample()` — because a 100 TB curation pipeline needs splits
  * that are (a) reproducible across reruns and engines, (b) stable under
  * repartitioning, and (c) consistent when the corpus grows (a document's
  * split never changes as other documents are added). Per-row map work,
  * no shuffle, and exactly mirrorable in the DuckDB oracle.
  */
object Sampling {
  /** Hash bucket 0..99 from the id's decimal string: first 16 bits of
    * md5, mod 100. */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long") % 100).as("bucket")

  /** Train/val/test assignment by hash bucket: [0, trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
                valPct: Int = 10, splitCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val b = hashBucket(col(idCol))
    df.withColumn(splitCol,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic pct% subsample: keep rows whose hash bucket < pct. */
  def sampleByHash(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct > 0 && pct <= 100)
    df.where(hashBucket(col(idCol)) < pct)
  }

  /** Per-source quota: keep at most `n` documents per source, chosen in
    * md5-of-id order — a deterministic unbiased draw, unlike "first n by
    * id" (which prefers old documents) or `rand()` (which differs every
    * run). This is the mixture-weighting primitive: cap over-represented
    * sources before training. Window partitioned by source — parallel
    * across sources. An extremely skewed source still rank-sorts its
    * whole partition (with spilling); at that extreme, pre-prune to the
    * lexicographically-smallest md5 slice expected to hold ≥ n ids
    * (verified against per-source counts) before ranking — md5 order is
    * uniform, so the slice is a prefix of the same draw. */
  def quotaPerSource(df: DataFrame, idCol: String, sourceCol: String,
                     n: Int): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__r", row_number().over(w))
      .where(col("__r") <= n)
      .drop("__r")
  }

  /** Greedy token-budget packing for training batches: documents are
    * assigned to (split, shard) lanes deterministically, then packed in
    * id order — a document opens a new batch when the tokens accumulated
    * BEFORE it cross the budget. Windows are partitioned by
    * (split, shard), never global, so each lane packs independently and
    * in parallel — the shard count is the parallelism knob at 100 TB
    * (one lane never exceeds corpus/nShards). Estimated tokens = the
    * chars/4 proxy from TextAnalysis.tokenCounts. */
  def packByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long, nShards: Int = 8): DataFrame = {
    require(budgetTokens > 0 && nShards > 0)
    val est = ceil(length(col(textCol)) / 4.0).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard"))
      .orderBy(col(idCol).asc)
    withSplit(df, idCol)
      .withColumn("shard", hashBucket(col(idCol)) % nShards)
      .withColumn("est_tokens", est)
      .withColumn("batch_id",
        floor((sum(col("est_tokens")).over(w) - col("est_tokens"))
          / lit(budgetTokens)).cast("long"))
  }

  /** Temperature-weighted domain mixing (the α = 0.5 mixture-reweighting
    * used to flatten source skew in LLM training corpora, cf. the
    * multinomial-smoothing exponent of Conneau & Lample 2019): each
    * source keeps `min(count, ceil(multiplier · √count))` documents — an
    * over-represented source is downsampled ∝ √count while small sources
    * pass intact, which is exactly the α = 0.5 power mix with the
    * normalizer folded into `multiplier`. No global Σw^α term is
    * computed: that keeps the arithmetic free of summation-order
    * dependence (IEEE sqrt is correctly rounded, the multiplier scaling
    * is exact), so the DuckDB oracle replays quotas bit-for-bit. The
    * within-source draw is the same deterministic md5-order rank as
    * [[quotaPerSource]]. Scale shape: one map-side-combined count per
    * source, a broadcast of the tiny quota table, and a per-source
    * window — parallel across sources. */
  def temperatureMixSample(df: DataFrame, idCol: String, sourceCol: String,
                           multiplier: Int = 4): DataFrame = {
    require(multiplier > 0)
    val quotas = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(sourceCol),
        least(col("__n"),
          ceil(sqrt(col("__n")) * multiplier).cast("long")).as("__quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= col("__quota"))
      .drop("__r", "__quota")
  }

  /** Deterministic training-order shuffle: every row gets a (shard, pos)
    * coordinate from the md5 of a salt + its id — the global order
    * (shard, pos) is the epoch's shuffled read order, and a new salt is
    * a fresh, fully reproducible epoch permutation. No `rand()`, no
    * global sort: shard assignment is per-row map work and `pos` ranks
    * WITHIN a shard (window partitioned by shard — `nShards` is the
    * parallelism knob; a 100 TB corpus writes one sorted file set per
    * shard, which is how training loaders consume it). */
  def shuffleIntoShards(df: DataFrame, idCol: String, nShards: Int,
                        salt: String = "epoch0"): DataFrame = {
    require(nShards > 0)
    val h = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    // 15 hex chars = 60 hash bits before the mod (same width as the KMV
    // hash): any practical shard count divides 2^60 with negligible
    // modulo bias, and shard ids far beyond 65 536 stay reachable — the
    // 4-char form left every shard > 2^16 permanently empty, at odds
    // with the 100 TB framing above.
    df.withColumn("__h", h)
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 15), 16, 10).cast("long")
          % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
