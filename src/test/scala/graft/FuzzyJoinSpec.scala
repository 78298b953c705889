package graft

import graft.dedup.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScalaCheckTest}

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Reference DP Levenshtein for the brute-force cross-check. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0)
      d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).toSet

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", d)
      .as[(Long, Long, Int)].collect().toSet

  test("deletion neighborhood at d=1: identity plus each deletion") {
    val r = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 1).as("n"))
      .as[Seq[String]].head()
    assert(r.toSet == Set("abc", "bc", "ac", "ab"))
  }

  test("planted edits: substitution, insertion, deletion all found at d=1") {
    val rows = Seq(
      1L -> "retrieval", 2L -> "retrieval",  // dist 0 (distinct ids)
      3L -> "retrievol",                     // sub
      4L -> "retrievall",                    // ins
      5L -> "retrieva",                      // del
      6L -> "transformer")                   // far
    assert(run(rows, 1) == brute(rows, 1))
    assert(run(rows, 1).contains((1L, 3L, 1)))
    assert(run(rows, 1).contains((1L, 4L, 1)))
    assert(run(rows, 1).contains((1L, 5L, 1)))
    assert(!run(rows, 1).exists { case (a, b, _) => a == 6L || b == 6L })
  }

  test("d=2 equals brute force on a mixed-radius corpus") {
    val rows = Seq(
      1L -> "embedding", 2L -> "embeddings", 3L -> "embedxyng",
      4L -> "embed", 5L -> "bedding", 6L -> "shardmap")
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("property: selfJoin equals brute force on random short strings") {
    val word = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(corpus, Gen.oneOf(1, 2)) { (words, d) =>
      val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      run(rows, d) == brute(rows, d)
    }
    val res = ScalaCheckTest.check(
      ScalaCheckTest.Parameters.default
        .withMinSuccessfulTests(12).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }

  test("degenerate corpora: empty, single row, exact-duplicate cluster") {
    assert(run(Seq.empty[(Long, String)], 1).isEmpty)
    assert(run(Seq(1L -> "alone"), 1).isEmpty)
    // exact duplicates: every pair reported at dist 0 (the documented
    // quadratic-within-cluster case the cascade removes beforehand)
    val dups = Seq(1L -> "same", 2L -> "same", 3L -> "same")
    assert(run(dups, 1) == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("empty-string rows join only with single-char strings, not crash") {
    val rows = Seq(1L -> "", 2L -> "a", 3L -> "", 4L -> "ab")
    assert(run(rows, 1) == brute(rows, 1))
  }

  test("lookup: typo queries resolve via the key-table artifact exactly") {
    val dict = Seq(1L -> "tensor", 2L -> "sensor", 3L -> "cursor")
    val qs = Seq(
      10L -> "tenso",    // del  → tensor (1)
      11L -> "sensors",  // ins  → sensor (1)
      12L -> "cursur",   // sub  → cursor (1)
      13L -> "vector")   // far  → none
    val keys = FuzzyJoin.keyTable(dict.toDF("id", "s"), "id", "s", 1)
    val got = FuzzyJoin.lookup(keys, qs.toDF("qid", "qs"), "qid", "qs", 1)
      .as[(Long, Long, Int)].collect().toSet
    val exact = (for {
      (qid, q) <- qs; (did, d) <- dict
      dist = lev(q, d); if dist <= 1
    } yield (qid, did, dist)).toSet
    assert(got == exact)
    assert(got.contains((10L, 1L, 1)) && got.contains((11L, 2L, 1)) &&
      got.contains((12L, 3L, 1)))
    assert(!got.exists(_._1 == 13L))
  }

  test("block join is an equi-join on the variant key, not a cartesian") {
    val df = Seq(1L -> "alpha", 2L -> "alphb").toDF("id", "s")
    val plan = FuzzyJoin.selfJoin(df, "id", "s", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("deletion tier refuses content-length strings, loudly") {
    val long = Seq(1L -> ("x" * 200), 2L -> "short").toDF("id", "s")
    val e1 = intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(long, "id", "s", 1).collect()
    }
    assert(e1.getMessage.contains("jaccard"),
      s"guard message should point at the Jaccard tier: ${e1.getMessage}")
    intercept[IllegalArgumentException] {
      FuzzyJoin.keyTable(long, "id", "s", 1).collect()
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.lookup(
        FuzzyJoin.keyTable(Seq(1L -> "dict").toDF("id", "s"), "id", "s", 1),
        long, "id", "s", 1).collect()
    }
  }

  test("passjoin equals brute force incl. insert/delete length changes") {
    import graft.dedup.PassJoin
    // deterministic ~70-char strings with planted substitutions,
    // insertions, AND deletions (unequal lengths exercise the l-range
    // and shifted-window probe arithmetic)
    val rng = new scala.util.Random(42)
    def randS(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(4)).toChar)
      .mkString // tiny alphabet: accidental near-pairs possible = good
    val bases = (0 until 12).map(_ => randS(66 + rng.nextInt(8)))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      val sub = b.updated(7, if (b(7) == 'a') 'b' else 'a')
      val ins = b.substring(0, 30) + "Q" + b.substring(30)
      val del = b.substring(0, 44) + b.substring(45)
      Seq((i * 10L, b), (i * 10L + 1, sub), (i * 10L + 2, ins),
        (i * 10L + 3, del))
    }
    val df = rows.toDF("id", "s")
    for (d <- 1 to 2) {
      val got = PassJoin.selfJoin(df, "id", "s", d)
        .as[(Long, Long, Int)].collect().toSet
      val brute = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist)).toSet
      assert(got == brute,
        s"d=$d: got ${got.size} pairs, brute ${brute.size}; " +
          s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
      assert(brute.nonEmpty, "test corpus must contain true pairs")
    }
  }

  test("nearPairsAuto dispatches by length: edit tier short, jaccard long") {
    val short = Seq(1L -> "alpha", 2L -> "alphb", 3L -> "gamma")
      .toDF("id", "s")
    val se = FuzzyJoin.nearPairsAuto(short, "id", "s", maxDist = 1, k = 10)
      .as[(Long, Long, Double, String)].collect().toSet
    assert(se == Set((1L, 2L, 1.0, "edit")))
    // mid-length rows (64 < len <= 256) keep EXACT edit semantics via
    // the PassJoin segment tier
    val mid = (1 to 30).map(i => s"tok$i").mkString(" ") // ~170 chars
    val midB = mid.replace("tok7", "tokX")               // 1 substitution
    val midDf = Seq(1L -> mid, 2L -> midB, 3L -> mid.reverse)
      .toDF("id", "s")
    val me = FuzzyJoin.nearPairsAuto(midDf, "id", "s", maxDist = 1, k = 10)
      .as[(Long, Long, Double, String)].collect().toSet
    assert(me == Set((1L, 2L, 1.0, "edit_segment")), s"mid tier: $me")
    // content-length rows (>256 chars) route to the Jaccard tier and
    // report that tier's metric; ≥21 docs so the tier's 5% df cap
    // (ceil(n·0.05) ≥ 2) keeps the near-dup pair's shared shingles
    val doc = (1 to 60).map(i => s"token$i").mkString(" ") // ~460 chars
    val docB = doc.replace("token7 ", "tokenX ")
    val filler = (3 to 40).map(d =>
      d.toLong -> (1 to 60).map(i => s"w${d}x$i").mkString(" "))
    val longDf = (Seq(1L -> doc, 2L -> docB) ++ filler).toDF("id", "s")
    val le = FuzzyJoin.nearPairsAuto(longDf, "id", "s", maxDist = 1, k = 10)
      .as[(Long, Long, Double, String)].collect()
    assert(le.nonEmpty && le.forall(_._4 == "jaccard"))
    val top = le.maxBy(_._3)
    assert(top._1 == 1L && top._2 == 2L && top._3 > 0.7,
      s"near-dup docs should top the jaccard tier: ${le.toSeq}")
  }
}
