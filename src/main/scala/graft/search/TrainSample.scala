package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-set cap for trained quantizers (IVF / PQ /
  * graph-build coarse sharding).
  *
  * A KMeans fit over the FULL corpus is the one build-phase term that
  * goes super-linear under corpus growth: the fit is
  * O(iters · n · k · dim), and the families that grow `k` with the
  * corpus (graph sharding's `nlistForCorpus`, SemanticDedup's
  * nlist ∝ n contract) turn that into O(n²). SCALE.md's 1M rehearsal
  * measured `ivf_build` t-exp 1.55 before this cap existed. Every
  * production quantizer trains on a sample (FAISS's own
  * `train(sample)`, Milvus segment-sample training); the quantizer's
  * job is to model the DISTRIBUTION, which a bounded sample does at any
  * corpus size — assignment still covers every row.
  *
  * The sample is a pure function of the vector value, in the
  * [[graft.curate.Sampling]] hash-bucket discipline (reproducible
  * across reruns and engines, stable under repartitioning, consistent
  * under corpus growth): keep rows whose `xxhash64(vector) mod 1e6`
  * falls under `cap/n` parts-per-million. No sort, no shuffle — one
  * map-side filter feeding the fit. Corpora at or under the cap train
  * on everything, so small-fixture oracle results are byte-identical
  * with or without the cap; only the ≥10⁶ rehearsal tier changes (and
  * only the fit input — centroids remain a staged artifact, so the
  * DuckDB oracles replay assignment/probe/rerank from the handoff
  * exactly as before).
  */
object TrainSample {
  /** Default fit cap: 2¹⁷ rows. At dim 64 that is a ~32 MB training
    * set — comfortably a single executor's KMeans working set — while
    * ≥ 32× the largest auto-derived nlist at the 1M rehearsal tier. */
  val DefaultCap: Long = 131072L

  /** Rows to train on: `df` unchanged when `n ≤ cap`, else the
    * deterministic ~`cap`-expected-size hash sample. `k` is the
    * quantizer's cluster count — the effective cap is raised to `4k`
    * so a fit can never see fewer points than centroids. */
  def forFit(df: DataFrame, vecCol: String, n: Long, cap: Long,
             k: Int = 1): DataFrame = {
    require(cap > 0, s"trainSampleCap must be > 0, got $cap")
    val eff = math.max(cap, 4L * k)
    if (n <= eff) df
    else {
      val keepPpm = math.max(1L, math.ceil(eff.toDouble * 1e6 / n).toLong)
      df.where(pmod(xxhash64(col(vecCol)), lit(1000000L)) < keepPpm)
    }
  }
}
