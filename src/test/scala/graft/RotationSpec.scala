package graft

import graft.search.Rotation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contracts of the MRL rotation (see [[graft.search.Rotation]]):
  * orthonormal deterministic basis, energy compaction into the prefix,
  * and byte-identical relearning. */
class RotationSpec extends SparkSpec {
  import spark.implicits._

  // 200 deterministic dim-8 vectors whose energy lives in two oblique
  // directions (dims mixed), so an axis-aligned prefix is lossy but a
  // rotated one is not
  private lazy val corpus: DataFrame = (0 until 200).map { i =>
    val r = new scala.util.Random(31L * i + 7)
    val a = r.nextGaussian() * 3.0
    val b = r.nextGaussian() * 2.0
    val base = Array.fill(8)(r.nextGaussian() * 0.05)
    // energy along (e3+e6)/√2 and (e1−e7)/√2
    base(3) += a / math.sqrt(2); base(6) += a / math.sqrt(2)
    base(1) += b / math.sqrt(2); base(7) -= b / math.sqrt(2)
    (i.toLong, base.map(_.toFloat).toSeq)
  }.toDF("vec_id", "embedding")

  test("power basis is orthonormal") {
    val m = Rotation.secondMoment(corpus, "embedding", 8)
    val basis = Rotation.powerBasis(m, 4)
    for (i <- basis.indices; j <- i until basis.length) {
      val dot = basis(i).zip(basis(j)).map { case (x, y) => x * y }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<v$i, v$j> = $dot")
    }
  }

  test("top components capture the planted oblique directions") {
    val m = Rotation.secondMoment(corpus, "embedding", 8)
    val basis = Rotation.powerBasis(m, 2)
    // first component ~ ±(e3+e6)/√2 (variance 9), second ~ ±(e1−e7)/√2
    val c0 = basis(0)
    assert(math.abs(math.abs(c0(3)) - 1 / math.sqrt(2)) < 0.05 &&
      math.abs(math.abs(c0(6)) - 1 / math.sqrt(2)) < 0.05,
      s"component 0 off the planted direction: ${c0.toSeq}")
    val c1 = basis(1)
    assert(math.abs(math.abs(c1(1)) - 1 / math.sqrt(2)) < 0.05 &&
      math.abs(math.abs(c1(7)) - 1 / math.sqrt(2)) < 0.05,
      s"component 1 off the planted direction: ${c1.toSeq}")
  }

  test("rotated 2-prefix carries more energy than the raw 2-prefix") {
    val m = Rotation.secondMoment(corpus, "embedding", 8)
    val basis = Rotation.powerBasis(m, 2)
    // rotated prefix energy = Σ_c vᵀ M v; raw prefix energy = M00 + M11
    def quad(v: Array[Double]): Double =
      (0 until 8).map(i => (0 until 8).map(j => v(i) * m(i)(j) * v(j)).sum).sum
    val rotated = basis.map(quad).sum
    val raw = m(0)(0) + m(1)(1)
    assert(rotated > 2 * raw,
      s"rotation failed to compact energy: rotated=$rotated raw=$raw")
  }

  test("relearning on the same corpus is byte-identical") {
    def learn() = Rotation.collectRows(
      Rotation.learn(corpus, "embedding", dim = 8, k = 4))
      .map { case (c, w) => (c, w.toSeq) }
    val first = learn()
    val second = learn()
    assert(first.nonEmpty && first == second)
  }

  test("hadamard-sign rows: orthonormal, every weight ±1/√dim") {
    val rows = Rotation.hadamardSignRows(64, "graft-bin-rot")
    assert(rows.size == 64)
    val w = (1.0 / 8.0).toFloat
    assert(rows.forall(_._2.forall(v => v == w || v == -w)))
    for (i <- 0 until 64; j <- i until 64) {
      val dot = rows(i)._2.zip(rows(j)._2)
        .map { case (x, y) => x.toDouble * y.toDouble }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-12, s"<r$i, r$j> = $dot")
    }
  }

  test("projectRow mirrors projectCol bit for bit") {
    val rows = Rotation.hadamardSignRows(64, "graft-bin-rot")
    val vecs = (0 until 5).map { i =>
      val r = new scala.util.Random(17L * i + 3)
      Array.fill(64)((r.nextGaussian() * 2).toFloat)
    }
    val planSide = vecs.map(Tuple1(_)).toDF("v")
      .select(Rotation.projectCol(col("v"), rows).as("p"))
      .collect().map(_.getSeq[Float](0).toArray)
    vecs.zip(planSide).foreach { case (v, expect) =>
      assert(Rotation.projectRow(v, rows).toSeq == expect.toSeq)
    }
  }

  test("projectCol emits one rounded float per component, in order") {
    val rows = Seq(
      (1, Array(0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)),
      (0, Array(1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)))
    val df = Seq(Tuple1(Seq(3.25f, -2.5f, 1f, 1f, 1f, 1f, 1f, 1f)))
      .toDF("v")
    val got = df.select(Rotation.projectCol(col("v"), rows).as("p"))
      .collect()(0).getSeq[Float](0)
    // component order (0 then 1) regardless of input row order
    assert(got == Seq(3.25f, -2.5f))
  }
}
