package graft.search

import graft.dedup.Dedup
import graft.functions.VectorFunctions
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
  * (16 md5-derived hyperplanes → sign bits → band keys); only pairs
  * sharing a band are cosine-verified, and the per-document top-k is a
  * window over those candidates. Nothing in the plan is O(corpus²):
  *  - signature: per-row map work (O(rows × bits × dim));
  *  - candidate generation: equi-JOIN on (band, band_key) — shuffle by
  *    band key, cost Σ_key (rows-per-key)², driven by genuinely-similar
  *    clusters rather than n²;
  *  - per-id top-k: one shuffle of the candidate pairs by id (each pair
  *    contributes one row per endpoint), rank ≤ k.
  * No O(corpus) broadcast anywhere; the hyperplanes are md5-deterministic
  * so the DuckDB oracle reproduces the IDENTICAL candidate set and the
  * comparison is exact, not a recall gamble (same contract as
  * `dedup_cosine_pairs`).
  *
  * Documents whose band buckets contain no other document yield no rows —
  * correct for near-dup mining (no candidates ⇔ nothing within LSH
  * reach); a guaranteed-k variant would union an exact fallback for the
  * missing ids (their count is an observable, bounded follow-up scan).
  */
object AnnJoin {
  /** Per-id top-k most-cosine-similar neighbours among SRP-LSH candidate
    * pairs. Output: (id, nbr_rank 1..k, nbr, cosine), ordered by
    * (id, nbr_rank). Ranking uses the 4-dp-rounded cosine with an id
    * tie-break, so it is reproducible cross-engine. */
  def bulkTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
               dim: Int, bits: Int = 16, nBands: Int = 4): DataFrame = {
    require(bits % nBands == 0)
    val bandSize = bits / nBands
    val w = Dedup.srpWeights(bits, dim)
    def bandKey(sigCol: org.apache.spark.sql.Column, b: Int) =
      concat_ws("", (0 until bandSize).map(j =>
        sigCol.getItem(b * bandSize + j)): _*)
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Dedup.srpSignature(col(vecCol), w).as("sig"))
    val bands = sig.select(col("id"), col("v"), col("sig"),
      posexplode(array((0 until nBands).map(b => bandKey(col("sig"), b)): _*))
        .as(Seq("band", "band_key")))
    val a = bands.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("v").as("v_a"), col("sig").as("sig_a"))
    val b = bands.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("v").as("v_b"), col("sig").as("sig_b"))
    // id_a < id_b + first-matching-band: each unordered pair surfaces
    // exactly once, so the cosine kernel runs once per candidate pair;
    // both directions are recovered by the symmetric union below.
    val firstMatch = (0 until nBands).map { bd =>
      (col("band") === bd) && (0 until bd)
        .map(pb => bandKey(col("sig_a"), pb) =!= bandKey(col("sig_b"), pb))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    val pairs = a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b") && firstMatch)
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosineSim(col("v_a"), col("v_b")), 4).as("cosine"))
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nbr"), col("cosine"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nbr"), col("cosine")))
    val byId = Window.partitionBy(col("id"))
      .orderBy(col("cosine").desc, col("nbr").asc)
    sym.withColumn("nbr_rank", row_number().over(byId).cast("long"))
      .where(col("nbr_rank") <= k)
      .select(col("id"), col("nbr_rank"), col("nbr"), col("cosine"))
  }
}
