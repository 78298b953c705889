package graft

import graft.rag.{Compose, EchoAnswerGenerator}
import org.apache.spark.sql.functions._

class ComposeSpec extends SparkSpec {
  import spark.implicits._

  private def hits = Seq(
    (1L, "第一章", "内容一"), (2L, "第二章", "内容二"))
    .toDF("rank", "chapter", "content")

  test("contextBlock renders numbered markdown lines in rank order") {
    val block = Compose.contextBlock(hits, "rank", "chapter", "content")
    assert(block == "1. **第一章**: 内容一\n2. **第二章**: 内容二")
  }

  test("kbAnswerBlock: header + body, and the empty-hits fallback") {
    val block = Compose.kbAnswerBlock(hits, "rank", "chapter", "content")
    assert(block.startsWith("## 🔍 **知识库答案**\n\n1. "))
    val empty = Compose.kbAnswerBlock(hits.where(lit(false)),
      "rank", "chapter", "content")
    assert(empty.contains("未在知识库中找到相关信息"))
  }

  test("answer generator seam is injectable and deterministic") {
    val gen = new EchoAnswerGenerator
    assert(gen.generate("p") == "[echo] p")
  }

  test("HLL sketch distinct counts are within rsd bounds of exact") {
    val approx = SparkEntry.queries("sketch_distinct_users")(spark, sf0001)
      .as[(String, Long)].collect().toMap
    val exact = SparkEntry.queries("exact_distinct_users")(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    approx.foreach { case (t, a) =>
      val e = exact(t)
      assert(math.abs(a - e) <= math.max(2L, (e * 0.1).toLong),
        s"$t: approx $a vs exact $e")
    }
  }
}
