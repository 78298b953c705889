package graft.curate

import graft.search.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pair generation for contrastive objectives (SimCLR/DPR-style
  * (anchor, positive, negative) triplets over an embedded corpus):
  *
  *  - positive: the anchor's nearest NON-SELF neighbor — exact kNN via
  *    the bounded-heap multi-query join ([[Knn.knnJoinLarge]]), so only
  *    |anchors|·k candidates ever shuffle, never the corpus.
  *  - negative: a deterministic uniform draw — the row at offset N/2 in
  *    id space ((anchor+N/2) mod N, dodging collisions with the anchor
  *    and positive). Id-space distance is uncorrelated with embedding
  *    distance, so this is a uniform negative, but unlike `rand()` it is
  *    reproducible across engines, reruns, and partitionings.
  *
  * Assumes dense ids 0..N-1 (the fixtures' layout; pipe anything else
  * through [[graft.core.Collection.withDenseIds]] first). Requires
  * N ≥ 4 so two dodge steps always land clear of {anchor, positive}.
  */
object Contrastive {
  /** One triplet per anchor (every `anchorEvery`-th id).
    * Output: anchor_id, positive_id, positive_distance, negative_id. */
  def triplets(emb: DataFrame, idCol: String, vecCol: String,
               anchorEvery: Int): DataFrame = {
    val n = emb.count() // one agg job for the id-space modulus
    require(n >= 4, s"need at least 4 rows for collision-free negatives, got $n")
    val anchors = emb.where(col(idCol) % anchorEvery === 0)
      .select(col(idCol).as("anchor_id"), col(vecCol).as("anchor_vec"))
    val nn = Knn.knnJoinLarge(emb, vecCol, idCol, anchors,
        "anchor_id", "anchor_vec", k = 2)
      .where(col(idCol) =!= col("anchor_id"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("distance").asc, col(idCol).asc)
    val best = nn.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("anchor_id"), col(idCol).as("positive_id"),
        col("distance").as("positive_distance"))
    def dodge(c: org.apache.spark.sql.Column) =
      when(c === col("anchor_id") || c === col("positive_id"),
        (c + 1) % n).otherwise(c)
    best
      .withColumn("negative_id",
        dodge(dodge((col("anchor_id") + lit(n / 2)) % n)))
      .orderBy(col("anchor_id").asc)
  }
}
