package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType,
  StructField, StructType}

/** Energy-compacting rotation for Matryoshka-style prefix search (MRL,
  * Kusupati et al. 2022, arXiv:2205.13147 — trained MRL embeddings
  * concentrate information in the leading dims; untrained embeddings
  * spread it uniformly, which is why `mrl_truncated_search`'s stage-1
  * recall is capped on this fixture). The classical remedy is public
  * technique (PCA-rotate before truncating — the OPQ/PCA preprocessing
  * step of Ge et al. 2013 and the Faiss OPQ/PCAR transforms): learn the
  * top-k eigenbasis of the corpus' uncentered second-moment matrix and
  * project onto it, so the prefix carries the most-variance directions.
  *
  * Spark shape: the moment matrix is ONE map-side pass (per-partition
  * dim×dim accumulators, 32 KB each, reduced on the driver — never a
  * shuffle of outer products); the eigenbasis is deterministic
  * driver-side power iteration with deflation (fixed start axis, fixed
  * iteration count, sign convention by largest coordinate — no
  * randomness anywhere, the KMeans-seed discipline). The learned basis
  * is a build-once artifact in FLOAT precision: both engines read the
  * same staged floats, so the projection math — float·float products
  * accumulated in double, rounded, cast to float — replays exactly.
  *
  * Scale: learning reads the corpus once (O(rows · dim²) map work, a
  * dim²-size driver reduce); serving adds 16 codegen'd dot products per
  * row. At 100 TB learn on a partition sample — the basis is a
  * statistic, not an index. */
object Rotation {

  /** Uncentered second-moment matrix Σ x·xᵀ / n of a float-vector column
    * (uncentered because cosine search is on RAW vectors — centering
    * would shift the geometry the projection must preserve). */
  def secondMoment(df: DataFrame, vecCol: String, dim: Int)
      : Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        val acc = new Array[Double](dim * dim)
        var rows = 0L
        it.foreach { v =>
          val a = v.toArray
          var i = 0
          while (i < dim && i < a.length) {
            var j = 0
            val xi = a(i).toDouble
            while (j < dim && j < a.length) {
              acc(i * dim + j) += xi * a(j).toDouble
              j += 1
            }
            i += 1
          }
          rows += 1
        }
        if (rows == 0) Iterator.empty else Iterator((acc.toSeq, rows))
      }.collect()
    val total = new Array[Double](dim * dim)
    var n = 0L
    parts.foreach { case (acc, rows) =>
      var i = 0
      while (i < total.length) { total(i) += acc(i); i += 1 }
      n += rows
    }
    require(n > 0, "rotation: empty corpus")
    Array.tabulate(dim, dim)((i, j) => total(i * dim + j) / n)
  }

  /** Top-k eigenbasis by deterministic power iteration with deflation:
    * start each component on the axis with the largest remaining
    * diagonal mass, re-orthogonalize against the accepted basis every
    * step (numerical deflation guard), fix the sign so the
    * largest-magnitude coordinate is positive. Pure function of the
    * input matrix. */
  def powerBasis(m: Array[Array[Double]], k: Int,
                 iters: Int = 100): Array[Array[Double]] = {
    val dim = m.length
    require(k <= dim)
    val a = m.map(_.clone())
    val basis = Array.ofDim[Double](k, dim)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    for (c <- 0 until k) {
      val start = (0 until dim).maxBy(i => (a(i)(i), -i))
      var v = Array.tabulate(dim)(i => if (i == start) 1.0 else 0.0)
      var it = 0
      while (it < iters) {
        val next = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(0.0)((s, j) => s + a(i)(j) * v(j)))
        // re-orthogonalize against accepted components
        for (p <- 0 until c) {
          val d = (0 until dim).foldLeft(0.0)((s, j) =>
            s + next(j) * basis(p)(j))
          var j = 0
          while (j < dim) { next(j) -= d * basis(p)(j); j += 1 }
        }
        val nn = norm(next)
        if (nn > 1e-12) { var j = 0
          while (j < dim) { next(j) /= nn; j += 1 }
          v = next
        }
        it += 1
      }
      // sign convention: largest-|coordinate| (lowest index on ties)
      // positive, so a rebuild lands on the identical representative
      val pivot = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) { var j = 0
        while (j < dim) { v(j) = -v(j); j += 1 } }
      basis(c) = v
      // deflate: a -= λ v vᵀ with λ the Rayleigh quotient
      val av = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((s, j) => s + m(i)(j) * v(j)))
      val lambda = (0 until dim).foldLeft(0.0)((s, i) => s + v(i) * av(i))
      for (i <- 0 until dim; j <- 0 until dim)
        a(i)(j) -= lambda * v(i) * v(j)
    }
    basis
  }

  /** Learn the top-`k` rotation rows for a corpus: one moment pass + the
    * driver eigensolve, emitted as `(component, weights ARRAY<FLOAT>)` —
    * the build-once artifact form both engines project with. */
  def learn(df: DataFrame, vecCol: String, dim: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    val basis = powerBasis(secondMoment(df, vecCol, dim), k)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        basis.zipWithIndex.toSeq.map { case (w, c) =>
          Row(c, w.map(_.toFloat).toSeq)
        }, 1),
      StructType(Seq(
        StructField("component", IntegerType, nullable = false),
        StructField("weights", ArrayType(FloatType, containsNull = false),
          nullable = false))))
  }

  /** Rotated-prefix projection column: for each component (in component
    * order) the float·float dot product accumulated in double, rounded
    * to 4 decimals, cast back to float — the exact op sequence the
    * DuckDB oracle replays over the same staged weights. */
  def projectCol(vec: org.apache.spark.sql.Column,
                 rows: Seq[(Int, Array[Float])])
      : org.apache.spark.sql.Column = {
    import graft.functions.VectorFunctions
    array(rows.sortBy(_._1).map { case (_, w) =>
      round(VectorFunctions.dot(vec, typedlit(w.toSeq)), 4)
    }: _*).cast("array<float>")
  }

  /** Collect a learned rotation artifact into the driver-side form
    * [[projectCol]] takes (k · dim floats — bounded by plan constants). */
  def collectRows(rot: DataFrame): Seq[(Int, Array[Float])] =
    rot.select(col("component"), col("weights")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
      .sortBy(_._1)

  /** Deterministic STRUCTURED rotation R = H·diag(s)/√dim — the
    * training-free randomized-rotation tier (Ailon & Chazelle 2009's
    * fast JL transform; the rotation step of RaBitQ, Gao & Long,
    * SIGMOD 2024): H is the dim×dim Walsh-Hadamard matrix
    * (H_cj = (−1)^popcount(c AND j)), s a ±1 sign vector derived from
    * md5(seed:j) — no corpus pass at all, unlike [[learn]]'s PCA. The
    * rows are exactly orthonormal and every weight is ±1/√dim (exact in
    * float for power-of-4 dims like 64), so projections introduce no
    * weight-representation error. Use where the rotation's job is to
    * SPREAD energy uniformly (sign/1-bit quantization) rather than
    * compact it into a prefix (MRL/OPQ — use [[learn]]). */
  def hadamardSignRows(dim: Int, seed: String): Seq[(Int, Array[Float])] = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"Walsh-Hadamard needs a power-of-2 dim, got $dim")
    val md = java.security.MessageDigest.getInstance("MD5")
    val signs = Array.tabulate(dim) { j =>
      val h = md.digest(s"$seed:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1f else -1f
    }
    val inv = (1.0 / math.sqrt(dim.toDouble)).toFloat
    (0 until dim).map { c =>
      (c, Array.tabulate(dim) { j =>
        val had = if (Integer.bitCount(c & j) % 2 == 0) 1f else -1f
        had * signs(j) * inv
      })
    }
  }

  /** Driver-side rows → the `(component, weights)` artifact DataFrame
    * (the staged form [[learn]] emits), for rotations that are computed
    * rather than learned. */
  def rowsToDf(spark: SparkSession, rows: Seq[(Int, Array[Float])])
      : DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (c, w) => Row(c, w.toSeq) }, 1),
      StructType(Seq(
        StructField("component", IntegerType, nullable = false),
        StructField("weights", ArrayType(FloatType, containsNull = false),
          nullable = false))))

  /** Driver-side mirror of [[projectCol]] for a single vector (the
    * 1-row query case): per component, float·float products accumulated
    * in double IN SLOT ORDER, rounded to 4 decimals, cast to float —
    * the identical op sequence, so a driver-projected query equals the
    * plan-projected one bit for bit. */
  def projectRow(vec: Array[Float], rows: Seq[(Int, Array[Float])])
      : Array[Float] =
    rows.sortBy(_._1).map { case (_, w) =>
      var acc = 0.0
      var i = 0
      val n = math.min(vec.length, w.length)
      while (i < n) { acc += vec(i).toDouble * w(i).toDouble; i += 1 }
      BigDecimal(acc).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble.toFloat
    }.toArray
}
