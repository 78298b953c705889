package graft

import graft.search.GraphAnn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Build + serving contracts of the graph-ANN family (see
  * [[graft.search.GraphAnn]]): degree bound, rebuild determinism,
  * exact-equivalence in the fully-connected degenerate case, and the
  * visited-budget guard. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  // 24 deterministic dim-4 vectors in two well-separated blobs, so the
  // coarse quantizer has real structure to shard on
  private lazy val corpus: DataFrame = (0 until 24).map { i =>
    val blob = if (i % 2 == 0) 0.0f else 10.0f
    (i.toLong, Seq(blob + (i % 5) * 0.1f, blob + (i % 3) * 0.2f,
      blob - (i % 7) * 0.1f, blob))
  }.toDF("vec_id", "embedding")

  private val params = GraphAnn.Params(degree = 4, nlist = 2, overlap = 2)

  test("adjacency respects the declared degree bound") {
    val deg = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", params)
      .groupBy("src").count().agg(max("count")).collect()(0).getLong(0)
    assert(deg <= params.degree, s"max out-degree $deg > ${params.degree}")
  }

  test("rebuild on the same corpus is byte-identical") {
    def edges = GraphAnn
      .buildAdjacency(corpus, "vec_id", "embedding", params)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    assert(edges == edges)
  }

  test("medoid is a single deterministic entry point") {
    val m1 = GraphAnn.medoid(corpus, "vec_id", "embedding").collect()
    val m2 = GraphAnn.medoid(corpus, "vec_id", "embedding").collect()
    assert(m1.length == 1 && m1(0).getLong(0) == m2(0).getLong(0))
  }

  test("fully-connected degenerate case: beam search equals exact search") {
    // overlap = nlist ⇒ every node co-shards with every other; with
    // degree ≥ n the graph is complete, round 1 visits the whole corpus,
    // and the beam result must be EXACTLY the brute-force top-k
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val entry = GraphAnn.medoid(corpus, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val query = Array(10.0f, 10.0f, 10.0f, 10.0f)
    val got = GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
        query, entry, k = 5, beamWidth = 4, rounds = 3, degree = 23)
      .collect().map(_.getLong(0)).toSeq
    val exact = corpus
      .select(col("vec_id"), round(graft.functions.VectorFunctions.l2Sq(
        col("embedding"), typedlit(query.toSeq)), 4).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"beam $got != exact $exact")
  }

  test("visited-budget guard rejects an over-degree adjacency") {
    // an adjacency with true degree 23 walked under a declared degree of
    // 1 must trip the budget require instead of silently ballooning
    val full = GraphAnn.Params(degree = 23, nlist = 2, overlap = 2)
    val adj = GraphAnn.buildAdjacency(corpus, "vec_id", "embedding", full)
    val ex = intercept[IllegalArgumentException] {
      GraphAnn.beamSearch(adj, corpus, "vec_id", "embedding",
        Array(0.0f, 0.0f, 0.0f, 0.0f), entryId = 0L,
        k = 5, beamWidth = 1, rounds = 2, degree = 1)
    }
    assert(ex.getMessage.contains("budget"))
  }
}
