package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
