package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed aggregators (SURVEY §2.7 "custom Aggregator" surface).
  *
  * [[VectorMeanAggregator]] computes a per-group mean vector (the IVF
  * centroid-update primitive) as a single-pass typed aggregate: the buffer
  * is a running (sum vector, count), merged associatively — map-side
  * partial aggregation applies, so at scale each executor ships one
  * dim-length buffer per group, not its rows. */
final class VectorMeanAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    val m = math.min(dim, v.length)
    while (i < m) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002):
  * the buffer keeps the `k` smallest DISTINCT hash values seen; the
  * estimate is `(k-1) / r_k` where `r_k` is the k-th minimum normalized to
  * (0, 1] — or the exact distinct count while fewer than `k` distinct
  * hashes exist. Fixed-size mergeable state, so map-side partial
  * aggregation ships one ≤k-long buffer per group per executor — the same
  * 100 TB shape as HLL (`approx_count_distinct`), but with a decisive
  * difference for this repo: fed md5-derived hashes it is fully
  * DETERMINISTIC and engine-portable, so the DuckDB oracle reproduces the
  * estimate bit-for-bit (HLL sketch internals are engine-specific —
  * `sketch_distinct_users` stays rows-only for exactly that reason).
  *
  * Input: non-negative hash longs uniform on [0, 2^60) (15 md5 hex chars;
  * 60 bits keeps every value exact in a signed long AND in DuckDB's
  * BIGINT-from-hex cast). Normalization divides by 2^60.
  */
final class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")
  private val norm = math.pow(2.0, 60)

  override def zero: Array[Long] = Array.empty[Long]

  /** Insert preserving "sorted ascending, distinct, length ≤ k". */
  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf // larger than current k-th min
      else {
        val out = new Array[Long](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  override def reduce(buf: Array[Long], hash: Long): Array[Long] =
    insert(buf, hash)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // Classic sorted-merge keeping k smallest distinct values.
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (n == 0 || v != last) { out(n) = v; n = n + 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * norm / buf(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
