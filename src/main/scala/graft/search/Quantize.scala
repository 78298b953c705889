package graft.search

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scalar int8 quantization for embedding storage — the 4× footprint cut
  * a 100 TB vector corpus takes before anything else (Milvus/FAISS call
  * this SQ8). Symmetric per-vector scheme: scale = 127 / max|x|,
  * q_i = round(x_i × scale) ∈ [-127, 127]; dequantize = q_i / scale.
  * Pure per-row map work (no shuffle), expressed in Catalyst array
  * functions so the DuckDB oracle can mirror it exactly.
  */
object Quantize {
  /** Per-vector scale; 0.0 for the all-zero vector (whose quantized form
    * is all zeros regardless). */
  def scaleCol(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x.cast("double"))))
    when(mx === 0.0, lit(0.0)).otherwise(lit(127.0) / mx)
  }

  /** Quantized int8 components (as INT array; range [-127, 127]). */
  def quantized(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") * scale, 0).cast("int"))

  /** Two-stage SQ8 search (FAISS's IVF_SQ8 rerank pattern, minus the IVF
    * tier): stage 1 scans the QUANTIZED corpus — the 4×-smaller
    * representation a 100 TB deployment actually stores — and takes the
    * top-(k·margin) candidates by reconstructed distance; stage 2 joins
    * only those candidates back to the full-precision vectors (broadcast
    * of k·margin rows, never the corpus) and reranks exactly. Both
    * stages are TakeOrderedAndProject, so nothing global is sorted.
    * Quantization error only costs candidate recall (tunable via
    * `margin`), never exactness of the final distances.
    *
    * `qdf`/`qCol` carry the query vector as a one-row broadcast, same
    * convention as [[Knn.topK]]. */
  def sq8RerankSearch(df: DataFrame, vecCol: String, idCol: String,
                      qdf: DataFrame, qCol: String,
                      k: Int, margin: Int = 4): DataFrame =
    searchQuantized(quantizedTable(df, vecCol, idCol), df, vecCol, idCol,
      qdf, qCol, k, margin)

  /** The stored SQ8 representation: (id, __scale, __qvec). A deployment
    * materializes this ONCE (it is the 4×-smaller table scans run over);
    * quantizing inline per query would pay the per-element rounding on
    * every search. */
  def quantizedTable(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val scale = scaleCol(col(vecCol))
    df.select(col(idCol), scale.as("__scale"),
      quantized(col(vecCol), scale).as("__qvec"))
  }

  /** Search over a pre-materialized [[quantizedTable]]; `full` supplies
    * the exact vectors for the rerank join. */
  def searchQuantized(qtab: DataFrame, full: DataFrame,
                      vecCol: String, idCol: String,
                      qdf: DataFrame, qCol: String,
                      k: Int, margin: Int): DataFrame = {
    val approx = round(VectorFunctions.dequantL2(
      col("__qvec"), col("__scale"), col(qCol)), 4)
    val cand = qtab.crossJoin(broadcast(qdf))
      .withColumn("approx_distance", approx)
      .orderBy(col("approx_distance").asc, col(idCol).asc)
      .limit(k * margin)
      .select(col(idCol), col("approx_distance"))
    broadcast(cand)
      .join(full.select(col(idCol), col(vecCol)), Seq(idCol))
      .crossJoin(broadcast(qdf))
      .withColumn("distance",
        round(VectorFunctions.l2Sq(col(vecCol), col(qCol)), 4))
      .select(col(idCol), col("approx_distance"), col("distance"))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
  }

  /** Squared reconstruction error ‖x − q/scale‖². */
  def reconSqError(v: Column, q: Column, scale: Column): Column =
    aggregate(
      zip_with(v, q, (x, qi) => {
        val deq = when(scale === 0.0, lit(0.0))
          .otherwise(qi.cast("double") / scale)
        (x.cast("double") - deq) * (x.cast("double") - deq)
      }),
      lit(0.0), (acc, e) => acc + e)
}
