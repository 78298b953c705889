package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** fastText-style linear classifier INFERENCE over hashed bag-of-words
  * features — the model-based quality filter of the CCNet/DCLM lineage
  * (Wenzek et al. 2020; Li et al. 2024: a linear classifier over hashed
  * n-gram features scores every document, and the corpus keeps the top
  * fraction). The heuristic twin is `quality_score`; this is the
  * learned-model shape.
  *
  * The engine contract is hash → average → sigmoid, all codegen
  * expressions (md5-bucket identical to [[graft.ingest.HashingEmbedder]];
  * no UDF, no model runtime): per token, weight = `w(bucket)`; per doc,
  * probability = σ(mean token weight). Weights here are a FIXED
  * deterministic function of the bucket — the stand-in for trained
  * parameters the same way HashingEmbedder stands in for a trained
  * encoder (SURVEY §7.4 item 1); a real model drops its weight vector in
  * via [[weightFor]]'s seam without touching the plan.
  *
  * Scale shape (100 TB): explode → per-doc hash aggregate — one scan,
  * map-side combined, no joins, no broadcast state beyond the weight
  * expression itself. This is why the fastText filter is the one every
  * web-scale pipeline actually runs over its full crawl. */
object LinearClassifier {
  /** md5 token bucket, 0-based, mod `dim` — codegen mirror of
    * HashingEmbedder.bucket (first 4 digest bytes, big-endian). */
  def bucketCol(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** The stand-in weight for bucket `b`: (b % 7 − 3)/10 ∈ [−0.3, 0.3]. */
  def weightFor(bucket: Column): Column =
    (bucket % 7 - 3).cast("double") / 10.0

  /** (idCol, quality_prob): σ(mean over tokens of w(bucket)), rounded —
    * tokenless docs score σ(0) = 0.5 (no evidence either way). */
  def score(df: DataFrame, idCol: String, textCol: String,
            dim: Int = 64): DataFrame = {
    val toks = df
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val perDoc = toks
      .select(col(idCol), weightFor(bucketCol(col("tok"), dim)).as("w"))
      .groupBy(col(idCol))
      .agg(avg(col("w")).as("s"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-coalesce(col("s"), lit(0.0))))
          + lit(1e-12), 4).as("quality_prob"))
  }
}
