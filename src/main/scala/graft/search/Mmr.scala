package graft.search

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Maximal-marginal-relevance diversity rerank (Carbonell & Goldstein,
  * SIGIR 1998) — the standard answer to "the top-k hits are 5 copies of
  * the same paragraph" in a RAG retrieval stack like the reference's
  * (src/app.py:240-274 returns raw top-k; MMR is the rerank Milvus users
  * bolt on client-side).
  *
  * Iteratively picks the candidate maximizing
  * `λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s)` where S is the already-picked
  * set — relevance traded against redundancy.
  *
  * Scale shape (100 TB): the corpus-sized work is the CANDIDATE
  * GENERATION (exact kNN / IVF probe — TakeOrderedAndProject, never a
  * global sort); MMR itself runs on the ≤`m` survivors of that top-m cut,
  * an O(k·m) driver loop on rows bounded by construction (same contract
  * as the 1-row query-vector collects elsewhere: `m` is a plan constant,
  * never data-dependent). Distributing an inherently sequential k-step
  * argmax over ≤m rows would buy k scheduler round-trips, not speed.
  *
  * Determinism: relevance and pairwise similarities are rounded to 4
  * decimals BEFORE the argmax, scores rounded after the λ-blend, ties
  * broken by lowest id — the same discipline the DuckDB oracle replays.
  */
object Mmr {
  /** Rerank `candidates` (small by construction: the post-limit output of
    * a top-m search carrying `idCol`, `relCol` — higher = more relevant —
    * and the raw vector in `vecCol`) down to `k` diverse picks.
    * Returns (step, idCol, mmr): step 1-based in pick order. */
  def rerank(candidates: DataFrame, idCol: String, relCol: String,
             vecCol: String, k: Int, lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    // bound BEFORE collecting: limit(4097) caps what reaches the driver,
    // so an unbounded candidate frame fails the require without ever
    // materializing the full set driver-side
    val rows = candidates
      .select(col(idCol).cast("long"), col(relCol).cast("double"),
        col(vecCol))
      .limit(4097)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).toArray))
    require(rows.length <= 4096,
      s"mmr: >4096 candidates — rerank a bounded top-m cut, " +
        "not a corpus (generate candidates with a top-k search first)")

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // HALF_UP, matching Spark's round() and DuckDB's round() — rint's
    // half-to-even would disagree with both on exact .00005 boundaries
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    // decimal-exact complement: 1 − 0.7 in doubles is 0.30000000000000004,
    // while the DuckDB oracle writes the literal 0.3 — on blends that land
    // exactly on a 5th decimal the two could round to opposite sides of
    // the HALF_UP boundary. BigDecimal subtraction yields decimal 0.3,
    // whose nearest double is the same 0.3 the oracle parses.
    val oneMinusLambda = (BigDecimal(1) - BigDecimal(lambda)).toDouble
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(
      rows.map(r => r._1 -> r): _*)
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    var step = 1
    while (step <= k && remaining.nonEmpty) {
      // argmax of the rounded blend, lowest id on ties (both engines agree
      // because every input to the blend is already rounded)
      val best = remaining.valuesIterator.map { case (id, rel, vec) =>
        val redundancy =
          if (pickedVecs.isEmpty) 0.0
          else pickedVecs.iterator.map(p => r4(cos(vec, p))).max
        (r4(lambda * rel - oneMinusLambda * redundancy), id, vec)
      }.reduceLeft { (a, b) =>
        if (b._1 > a._1 || (b._1 == a._1 && b._2 < a._2)) b else a
      }
      picked += ((step, best._2, best._1))
      pickedVecs += best._3
      remaining.remove(best._2)
      step += 1
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        picked.toSeq.map(p => Row(p._1, p._2, p._3)), 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("mmr", DoubleType, nullable = false))))
  }
}
