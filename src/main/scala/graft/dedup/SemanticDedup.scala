package graft.dedup

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup shape
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with a coarse
  * quantizer, then compare pairs ONLY within a cluster and drop every
  * document that has a sufficiently-similar lower-id companion. The
  * reference delegates all vector grouping to Milvus; this is the
  * Spark-native equivalent of the dedup pass a 100 TB training-data
  * pipeline runs between embedding ingest and sampling.
  *
  * Scale shape: the cluster assignment comes from an already-built coarse
  * quantizer (here the IVF index's KMeans layout — see
  * [[graft.search.IvfIndex]]), so this operator adds ONE equi-join of the
  * corpus with itself on `cluster_id` plus a codegen cosine per candidate
  * pair. Total pair work is Σ|cluster|² — linear in corpus size when
  * `nlist` grows with the corpus so cluster sizes stay bounded (the same
  * knob that sizes the IVF probe). `maxClusterSize` makes the bound hard:
  * clusters above it contribute NO pairs (their members are all kept) and
  * are reported loudly, mirroring the hot-bucket cap of the SRP-LSH family
  * ([[Dedup.srpHotBuckets]]) so one degenerate centroid can never make the
  * join quadratic.
  *
  * The keep rule is "duplicate iff SOME lower-id member of the same
  * cluster has rounded cosine ≥ tau" — order-independent and deterministic
  * (unlike greedy-scan SemDeDup, which depends on visit order), so the
  * DuckDB oracle replays it exactly from the handed-off assignment table.
  */
object SemanticDedup {
  /** Mark within-cluster near-duplicates. `assignments` is
    * `(idCol, cluster_id)` from the coarse quantizer; the result is one
    * row per assigned id: `(idCol, cluster_id, dup_of)` where `dup_of` is
    * the minimum lower id in the same cluster with
    * `round(cosine, 4) ≥ tau` (NULL ⇔ keep this document).
    *
    * Oversized clusters (> `maxClusterSize` members) are excluded from
    * pair generation — every member is kept. `logOversized` surfaces the
    * excluded-cluster count on stderr; it is opt-in because the eager
    * count is an extra aggregate job per invocation (the exclusion
    * itself always applies and is visible in the result's kept
    * members). */
  def markDuplicates(embeddings: DataFrame, assignments: DataFrame,
                     idCol: String, vecCol: String, tau: Double,
                     maxClusterSize: Int = 100000,
                     logOversized: Boolean = false): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    require(maxClusterSize > 1, s"maxClusterSize must be > 1")
    val asg = assignments.select(col(idCol), col("cluster_id"))
    val sizes = asg.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__cn"))
    if (logOversized) {
      val oversized = sizes.where(col("__cn") > maxClusterSize).count()
      if (oversized > 0)
        System.err.println(s"[graft] SemanticDedup: $oversized cluster(s) " +
          s"over maxClusterSize=$maxClusterSize excluded from pair " +
          s"generation (members kept)")
    }
    val bounded = asg.join(
      sizes.where(col("__cn") <= maxClusterSize).select("cluster_id"),
      Seq("cluster_id"))
    val v = bounded.join(embeddings.select(col(idCol), col(vecCol)), Seq(idCol))
    val a = v.select(col("cluster_id"), col(idCol).as("__id_a"),
      col(vecCol).as("__v_a"))
    val b = v.select(col("cluster_id"), col(idCol).as("__id_b"),
      col(vecCol).as("__v_b"))
    val dupOf = a.join(b, Seq("cluster_id"))
      .where(col("__id_a") < col("__id_b") &&
        round(VectorFunctions.cosineSim(col("__v_a"), col("__v_b")), 4) >= tau)
      .groupBy(col("__id_b").as(idCol))
      .agg(min(col("__id_a")).as("dup_of"))
    asg.join(dupOf, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id").cast("long").as("cluster_id"),
        col("dup_of"))
  }
}
