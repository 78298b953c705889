package graft.search

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bulk ANN join: for EVERY document, its k most-similar neighbours over
  * the whole corpus — the nightly all-corpus shape of a training-data
  * pipeline ("give each example its near-neighbour set"), which the
  * reference's single-query search (src/app.py:248-254) never needs but a
  * 100 TB curation run does.
  *
  * Sub-quadratic by construction: candidates come from the same
  * signed-random-projection LSH family as [[Dedup.cosineCandidatePairs]]
  * (64 md5-derived hyperplanes → sign bits → 4 bands of 16 bits); only
  * pairs sharing a non-hot band are cosine-verified, and the per-document
  * top-k is a window over those candidates. Nothing in the plan is
  * O(corpus²):
  *  - signature: per-row codegen map work (O(rows × bits × dim));
  *  - candidate generation: equi-JOIN on (band, band_key) — shuffle by
  *    band key, cost Σ_key (rows-per-key)². With 16-bit band keys two
  *    UNRELATED vectors collide with probability ≈ 0.5¹⁶ ≈ 1.5×10⁻⁵ per
  *    band, so candidate volume is driven by genuinely-similar clusters;
  *    `maxBucket` caps the residual quadratic term of any degenerate
  *    bucket with an observable dropped record ([[Dedup.srpHotBuckets]]);
  *  - per-id top-k: the symmetric closure is an `explode` of each pair
  *    into its two endpoint rows (so the band join + cosine kernel run
  *    ONCE per action, not once per union branch), then one shuffle of
  *    the candidate pairs by id, rank ≤ k.
  * No O(corpus) broadcast anywhere; the hyperplanes are md5-deterministic
  * so the DuckDB oracle reproduces the IDENTICAL candidate set and the
  * comparison is exact, not a recall gamble (same contract as
  * `dedup_cosine_pairs`).
  *
  * Documents whose band buckets contain no other document yield no rows —
  * correct for near-dup mining (no candidates ⇔ nothing within LSH
  * reach); [[bulkTopKGuaranteed]] is the variant that unions an exact
  * fallback for those ids so every document gets exactly k rows.
  */
object AnnJoin {
  /** Cosine-verified SRP-LSH candidate pairs for `df`, built either
    * in-plan or from the build-once parquet band artifact when `workDir`
    * is given (the warehouse form — see [[Dedup.srpBandsTable]]). */
  private def candidatePairs(df: DataFrame, idCol: String, vecCol: String,
                             dim: Int, bits: Int, nBands: Int,
                             maxBucket: Int,
                             workDir: Option[String]): DataFrame = {
    workDir match {
      case Some(d) =>
        Dedup.srpVerifiedPairsTable(df, idCol, vecCol, dim, bits, nBands,
          maxBucket, d)
      case None =>
        val bands = Dedup.srpBands(df, idCol, vecCol, dim, bits, nBands)
        Dedup.cosineVerifiedPairs(
          Dedup.srpKeptBands(bands, Dedup.srpHotBuckets(bands, maxBucket)))
    }
  }

  /** Each unordered pair exploded into its two directed endpoint rows
    * `(id, nbr, cosine)` — the symmetric closure without re-executing the
    * candidate join per union branch. */
  private def symmetric(pairs: DataFrame): DataFrame =
    pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nbr")),
        struct(col("id_b").as("id"), col("id_a").as("nbr")))).as("e"),
      col("cosine"))
      .select(col("e.id").as("id"), col("e.nbr").as("nbr"), col("cosine"))

  /** Per-id top-k over a symmetric `(id, nbr, cosine)` edge set. Ranking
    * uses the 4-dp-rounded cosine with an id tie-break, so it is
    * reproducible cross-engine. */
  private def topKPerId(sym: DataFrame, k: Int): DataFrame = {
    val byId = Window.partitionBy(col("id"))
      .orderBy(col("cosine").desc, col("nbr").asc)
    sym.withColumn("nbr_rank", row_number().over(byId).cast("long"))
      .where(col("nbr_rank") <= k)
      .select(col("id"), col("nbr_rank"), col("nbr"), col("cosine"))
  }

  /** Per-id top-k most-cosine-similar neighbours among SRP-LSH candidate
    * pairs. Output: (id, nbr_rank 1..k, nbr, cosine), ordered by
    * (id, nbr_rank). Ids with no surviving band companion yield no rows
    * (see class doc / [[bulkTopKGuaranteed]]). */
  def bulkTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
               dim: Int, bits: Int = 64, nBands: Int = 4,
               maxBucket: Int = 4096,
               workDir: Option[String] = None): DataFrame =
    topKPerId(symmetric(
      candidatePairs(df, idCol, vecCol, dim, bits, nBands, maxBucket,
        workDir)), k)

  /** Guaranteed-k bulk ANN join: like [[bulkTopK]], but ids the LSH tier
    * left DEFICIENT (fewer than k candidate neighbours — empty band
    * buckets, hot-bucket drops, or just a sparse neighbourhood) fall back
    * to their EXACT top-k over the whole corpus, so every id emits
    * exactly k rows (given corpus size > k).
    *
    * Scale shape: the deficient set is an observable, bounded follow-up —
    * its ids are collected per-id counts only (never vectors), and the
    * fallback is one scan of the corpus joined to the BROADCAST deficient
    * vectors with a per-partition bounded heap... expressed here as a
    * broadcast-join + window because the deficient count is small by
    * construction (LSH leaves few orphans; if it left many, the band
    * parameters are wrong, and the observable makes that loud). A
    * deficient id's rows are entirely exact (not a mix), so the semantics
    * are clean: `rows(id) = lsh_topk(id)` when LSH found ≥ k candidates,
    * else `exact_topk(id)`. */
  def bulkTopKGuaranteed(df: DataFrame, idCol: String, vecCol: String,
                         k: Int, dim: Int, bits: Int = 64, nBands: Int = 4,
                         maxBucket: Int = 4096,
                         workDir: Option[String] = None): DataFrame = {
    val sym = symmetric(
      candidatePairs(df, idCol, vecCol, dim, bits, nBands, maxBucket,
        workDir))
    // ids with ≥ k LSH rows keep them; everyone else (including ids with
    // ZERO candidates, which the edge set cannot even name) goes exact.
    // The ≥ k test rides the SAME per-id window shuffle as the ranking
    // (count over the id partition), so no O(corpus) id set is ever
    // broadcast or re-joined.
    val byId = Window.partitionBy(col("id"))
    val ranked = sym
      .withColumn("nbr_rank", row_number()
        .over(byId.orderBy(col("cosine").desc, col("nbr").asc)).cast("long"))
      .withColumn("__n_cand", count(lit(1)).over(byId))
    val lshKept = ranked
      .where(col("__n_cand") >= k && col("nbr_rank") <= k)
      .select(col("id"), col("nbr_rank"), col("nbr"), col("cosine"))
    val ids = df.select(col(idCol).as("id"))
    val full = ranked.where(col("__n_cand") >= k)
      .select(col("id")).distinct()
    val deficient = ids.join(full, Seq("id"), "left_anti")
    // Loud observable: a large deficient fraction means the band
    // parameters don't fit this corpus (sparse/uniform vectors rarely
    // share 16-bit band keys) and the exact tier is doing the real work.
    val nDeficient = deficient.count()
    if (nDeficient > 0)
      System.err.println(s"[graft] bulkTopKGuaranteed: $nDeficient id(s) " +
        s"below $k LSH candidates take the exact fallback")
    val defVecs = deficient
      .join(df.select(col(idCol).as("id"), col(vecCol).as("v_q")), Seq("id"))
    val corpus = df.select(col(idCol).as("nbr"), col(vecCol).as("v_c"))
    // Exact tier: corpus × broadcast(deficient) cosine, reduced by
    // PER-PARTITION bounded heaps (≤ k rows per deficient id per
    // partition survive) before the final per-id window — the
    // Knn.knnJoinLarge shuffle-bounding shape, here on the
    // (rounded cosine desc, nbr asc) order the oracle replays. Without
    // the heap the window sorts |corpus|·|deficient| candidate rows.
    val spark = df.sparkSession
    import spark.implicits._
    val exactPairs = corpus.join(broadcast(defVecs), col("nbr") =!= col("id"))
      .select(col("id"), col("nbr"),
        round(graft.functions.VectorFunctions.cosineSim(
          col("v_q"), col("v_c")), 4).as("cosine"))
      .as[(Long, Long, Double)]
    val exactCand = exactPairs.mapPartitions { it =>
      // max-heap on (−cosine, nbr): root = worst kept candidate. IEEE
      // comparison semantics (−0.0 == 0.0), NOT total ordering — the
      // final per-id window treats −0.0 and 0.0 as equal and breaks the
      // tie on nbr, and the heap must never evict the row the window
      // would keep.
      val ord: Ordering[(Double, Long)] = (x, y) =>
        if (x._1 < y._1) -1
        else if (x._1 > y._1) 1
        else java.lang.Long.compare(x._2, y._2)
      val heaps = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (id, nbr, cos) =>
        val h = heaps.getOrElseUpdate(id,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        val e = (-cos, nbr)
        if (h.size < k) h.enqueue(e)
        else if (ord.lt(e, h.head)) { h.dequeue(); h.enqueue(e) }
      }
      heaps.iterator.flatMap { case (id, h) =>
        h.iterator.map { case (negCos, nbr) => (id, nbr, -negCos) }
      }
    }.toDF("id", "nbr", "cosine")
    lshKept.unionByName(topKPerId(exactCand, k))
  }
}
