package graft

import graft.search.TrainSample
import org.apache.spark.sql.DataFrame

/** Contracts of the deterministic trained-quantizer fit cap
  * ([[graft.search.TrainSample]]): pass-through under the cap, expected
  * size near the cap above it, stability under repartitioning, and the
  * ≥-4k floor that keeps any fit over-determined. */
class TrainSampleSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int): DataFrame = (0 until n).map { i =>
    (i.toLong, Seq(i * 0.5f, (i % 17).toFloat, -i * 0.25f))
  }.toDF("vec_id", "embedding")

  test("corpus at or under the cap trains on every row") {
    val df = vecs(500)
    assert(TrainSample.forFit(df, "embedding", 500, cap = 500).count() == 500)
    assert(TrainSample.forFit(df, "embedding", 500, cap = 10000).count() == 500)
  }

  test("above the cap the sample lands near the cap, never at n") {
    val df = vecs(20000)
    val got = TrainSample.forFit(df, "embedding", 20000, cap = 2000).count()
    // hash-uniform draw: expected 2000, allow ±25%
    assert(got > 1500 && got < 2500, s"sample size $got not near cap 2000")
  }

  test("sample is a pure function of the vector: stable under repartition") {
    val df = vecs(20000)
    val a = TrainSample.forFit(df, "embedding", 20000, cap = 2000)
      .select("vec_id").as[Long].collect().sorted.toSeq
    val b = TrainSample.forFit(df.repartition(13), "embedding", 20000,
        cap = 2000)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("effective cap floors at 4k so a fit always sees >= k points") {
    val df = vecs(20000)
    // cap 10 with k=1000 -> effective cap 4000: sampling from 20k keeps
    // ~4000, far above k
    val got = TrainSample.forFit(df, "embedding", 20000, cap = 10, k = 1000)
      .count()
    assert(got > 3000, s"effective-cap sample $got not >= 3000")
  }
}
