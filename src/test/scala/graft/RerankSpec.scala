package graft

import graft.search.{Rerank, TokenJaccardScorer}
import org.apache.spark.sql.functions._

/** The cross-encoder rerank seam ([[graft.search.Rerank]]): batched
  * pair-scoring discipline and the deterministic offline scorer. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "scan the filter scan", 0.9),
    (1L, "merge filter join", 0.8),
    (2L, "scan scan scan", 0.7),
    (3L, "window shuffle", 0.6),
    (4L, "", 0.5)).toDF("id", "text", "fused")

  test("jaccard scorer: set semantics, empties, determinism") {
    val sc = new TokenJaccardScorer
    // dup tokens collapse: {scan, the, filter} vs {scan, filter, merge}
    assert(sc.score(Seq(("scan filter merge", "scan the filter scan")))
      == Seq(2.0 / 4.0))
    assert(sc.score(Seq(("", ""))) == Seq(0.0)) // both empty ⇒ 0, no NaN
    assert(sc.score(Seq(("scan", ""))) == Seq(0.0))
    // case-insensitive (Locale.ROOT)
    assert(sc.score(Seq(("SCAN", "scan"))) == Seq(1.0))
  }

  test("batch boundaries never change scores (the seam contract)") {
    val q = "scan filter merge"
    def scored(batchSize: Int) =
      Rerank.withPairScores(docs, q, "text", "ce", new TokenJaccardScorer,
          batchSize)
        .select("id", "ce").as[(Long, Double)].collect().toMap
    val one = scored(1)
    assert(scored(2) == one && scored(100) == one)
    // and the values are the scorer's own, rounded to 4 decimals
    val sc = new TokenJaccardScorer
    docs.select("id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val want = BigDecimal(sc.score(Seq((q, text))).head)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(one(id) == want, s"id=$id")
    }
  }

  test("crossEncoderRerank: pair score decides, fusion breaks ties") {
    val fused = docs.select("id", "fused")
    val got = Rerank.crossEncoderRerank(fused, docs, "id", "text",
        "fused", "scan filter merge", new TokenJaccardScorer, k = 3)
      .select("id").as[Long].collect().toSeq
    // jaccard: d0 = 2/4, d1 = 2/4, d2 = 1/3, d3 = 0, d4 = 0
    // d0 vs d1 tie on ce ⇒ fused desc decides (0.9 > 0.8)
    assert(got == Seq(0L, 1L, 2L))
  }
}
