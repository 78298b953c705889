package graft

import graft.functions.VectorFunctions
import graft.plans.IvfProbeRewrite
import graft.search.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF probe-rewrite rule needs a session built WITH the extensions,
  * so this suite constructs its own on the shared SparkContext. */
class RewriteSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("naive orderBy(l2)+limit over a registered IVF table gets probe-pruned") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = "/tmp/graft_ivf_rewrite_test"
    val model = IvfIndex.build(e, "embedding", dir, nlist = 8)
    val query = e.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

    def naive = spark.read.parquet(IvfIndex.dataDir(dir))
      .select(col("vec_id"),
        round(VectorFunctions.l2Sq(col("embedding"), typedlit(query)), 4)
          .as("distance"))
      .orderBy(col("distance").asc, col("vec_id").asc)
      .limit(10)

    try {
      // nprobe = nlist: rewrite fires but must stay exact
      IvfProbeRewrite.register(model, nprobe = 8)
      val full = naive
      val optimized = full.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("cluster_id"),
        s"probe filter not injected:\n$optimized")
      val exactIds = IvfIndex.search(spark, model, "embedding", "vec_id",
        query, k = 10, nprobe = 8).select("vec_id").as[Long].collect().toSeq
      assert(full.select("vec_id").as[Long].collect().toSeq == exactIds)

      // nprobe = 2: the SAME naive query now scans only 2 partitions
      IvfProbeRewrite.register(model, nprobe = 2)
      val pruned = naive
      val expected = IvfIndex.search(spark, model, "embedding", "vec_id",
        query, k = 10, nprobe = 2).select("vec_id").as[Long].collect().toSeq
      assert(pruned.select("vec_id").as[Long].collect().toSeq == expected)
    } finally {
      IvfProbeRewrite.clear()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("scalar-subquery query vector (sql_knn pattern) gets probe-pruned") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = "/tmp/graft_ivf_rewrite_sql_test"
    val model = IvfIndex.build(e, "embedding", dir, nlist = 8)
    GraftExtensions.register(spark)
    spark.read.parquet(IvfIndex.dataDir(dir))
      .createOrReplaceTempView("rw_ivf_data")
    e.createOrReplaceTempView("rw_embeddings")
    def naive = spark.sql("""
      SELECT vec_id,
             round(graft_l2_sq(embedding,
               (SELECT embedding FROM rw_embeddings WHERE vec_id = 11)), 4)
               AS distance
      FROM rw_ivf_data
      ORDER BY distance ASC, vec_id ASC LIMIT 10
    """)
    val query = e.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    try {
      IvfProbeRewrite.register(model, nprobe = 8)
      val full = naive
      val optimized = full.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("cluster_id"),
        s"probe filter not injected for subquery form:\n$optimized")
      val exactIds = IvfIndex.search(spark, model, "embedding", "vec_id",
        query, k = 10, nprobe = 8).select("vec_id").as[Long].collect().toSeq
      assert(full.select("vec_id").as[Long].collect().toSeq == exactIds)

      // partial probe: same SQL text, pruned to the 2 nearest clusters
      IvfProbeRewrite.register(model, nprobe = 2)
      val expected = IvfIndex.search(spark, model, "embedding", "vec_id",
        query, k = 10, nprobe = 2).select("vec_id").as[Long].collect().toSeq
      assert(naive.select("vec_id").as[Long].collect().toSeq == expected)
    } finally {
      IvfProbeRewrite.clear()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("routed auto-rewrite: the SAME naive query lands on the " +
      "router-chosen tier, and a budget flip re-routes it to SQ8") {
    import graft.search.{Quantize, Router}
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = "/tmp/graft_routed_rw_test"
    val sq8Dir = "/tmp/graft_routed_rw_sq8"
    Seq(dir, sq8Dir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    val model = IvfIndex.build(e, "embedding", dir, nlist = 8)
    Quantize.quantizedTable(e, "embedding", "vec_id")
      .write.mode("overwrite").parquet(sq8Dir)
    val n = e.count()
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    // a handcrafted MEASURED panel: every tier exact here (the spec pins
    // DISPATCH, not recall); costs make ivf the min-cost meeting tier,
    // mem_bytes gives sq8 the only sub-budget residency
    val panel = Seq(
      ("flat", 1.0, n, n * 4L * dim),
      ("ivf", 1.0, n / 4, n * 4L * dim + 8L * 4 * dim),
      ("sq8", 1.0, n, n * (dim + 8L)))
      .toDF("tier", "recall", "cost", "mem_bytes")
    val tiers = Seq(
      Router.Tier("flat", present = true, filterCapable = true),
      Router.Tier("ivf", present = true, filterCapable = true),
      Router.Tier("sq8", present = true, filterCapable = false))
    // margin large enough that k·margin ≥ n: the candidate stage keeps
    // every row, so the exact rerank IS exact top-k by construction
    def cfg(budget: Option[Long]) = IvfProbeRewrite.RoutedConfig(
      model, nprobe = 8, sq8Dir, sq8Margin = 1000,
      idCol = "vec_id", vecCol = "embedding",
      panel = () => panel, tiers = tiers,
      flatTier = "flat", ivfTier = "ivf", sq8Tier = "sq8",
      recallTarget = 0.9, memoryBudget = budget,
      fingerprintRoots = Seq(dir, sq8Dir))
    val query = e.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    def naive = spark.read.parquet(IvfIndex.dataDir(dir))
      .select(col("vec_id"),
        round(VectorFunctions.l2Sq(col("embedding"), typedlit(query)), 4)
          .as("distance"))
      .orderBy(col("distance").asc, col("vec_id").asc)
      .limit(10)
    try {
      // no budget: ivf is the min-cost meeting tier -> probe filter
      IvfProbeRewrite.registerRouted(cfg(None))
      assert(IvfProbeRewrite.routedDecision(spark, dir) == Some("ivf"))
      val p1 = naive
      assert(p1.queryExecution.optimizedPlan.toString().contains("cluster_id"),
        "router-chosen ivf must inject the probe predicate")
      val exactIds = IvfIndex.search(spark, model, "embedding", "vec_id",
        query, k = 10, nprobe = 8).select("vec_id").as[Long].collect().toSeq
      assert(p1.select("vec_id").as[Long].collect().toSeq == exactIds)

      // budget flip = sq8's residency only: the SAME query text now
      // compiles to the two-stage quantized plan over the codes dir
      IvfProbeRewrite.registerRouted(cfg(Some(n * (dim + 8L) + 1)))
      assert(IvfProbeRewrite.routedDecision(spark, dir) == Some("sq8"))
      val p2 = naive
      val opt2 = p2.queryExecution.optimizedPlan.toString()
      assert(opt2.contains("dequant_l2_sq"),
        s"router-chosen sq8 must splice the quantized-scan plan:\n$opt2")
      assert(p2.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.references.exists(_.name == "cluster_id") => f
      }.isEmpty, "sq8 route must not also inject the ivf probe")
      assert(p2.columns.toSeq == Seq("vec_id", "distance"))
      assert(p2.select("vec_id").as[Long].collect().toSeq == exactIds,
        "margin ≥ n/k makes the sq8 rerank exact")

      // a USER predicate between the sort and the relation: the sq8
      // tier is filterCapable=false and its splice would silently drop
      // the filter (round-13 ADVICE high) — the rewrite must decline
      // and serve the exact flat plan, filter intact
      val filtered = spark.read.parquet(IvfIndex.dataDir(dir))
        .where(col("vec_id") % 2 === 0)
        .select(col("vec_id"),
          round(VectorFunctions.l2Sq(col("embedding"), typedlit(query)), 4)
            .as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(10)
      val opt3 = filtered.queryExecution.optimizedPlan.toString()
      assert(!opt3.contains("dequant_l2_sq"),
        s"sq8 must not splice over a user filter:\n$opt3")
      val got3 = filtered.select("vec_id").as[Long].collect().toSeq
      assert(got3.nonEmpty && got3.forall(_ % 2 == 0),
        "the user filter must survive the routed rewrite")

      // re-registering without the budget routes BACK (cache dropped)
      IvfProbeRewrite.registerRouted(cfg(None))
      assert(IvfProbeRewrite.routedDecision(spark, dir) == Some("ivf"))
      assert(naive.queryExecution.optimizedPlan.toString()
        .contains("cluster_id"))
    } finally {
      IvfProbeRewrite.clear()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("routed graph tier: the rewrite DECLINES (exact plan untouched) " +
      "and serveRouted dispatches to the registered walk thunk") {
    import graft.search.{GraphAnn, Quantize, Router}
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = "/tmp/graft_routed_graph_test"
    val sq8Dir = "/tmp/graft_routed_graph_sq8"
    Seq(dir, sq8Dir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    val model = IvfIndex.build(e, "embedding", dir, nlist = 8)
    Quantize.quantizedTable(e, "embedding", "vec_id")
      .write.mode("overwrite").parquet(sq8Dir)
    val adj = GraphAnn.buildAdjacency(e, "vec_id", "embedding")
    val entryId = GraphAnn.medoid(e, "vec_id", "embedding")
      .collect()(0).getLong(0)
    val n = e.count()
    // handcrafted measured panel: the graph walk meets the target at a
    // tenth of flat's cost — the router must choose it
    val panel = Seq(
      ("flat", 1.0, n, 0L),
      ("graph", 1.0, n / 10, 0L))
      .toDF("tier", "recall", "cost", "mem_bytes")
    val query = e.where(col("vec_id") === 11).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    def naive = spark.read.parquet(IvfIndex.dataDir(dir))
      .select(col("vec_id"),
        round(VectorFunctions.l2Sq(col("embedding"), typedlit(query)), 4)
          .as("distance"))
      .orderBy(col("distance").asc, col("vec_id").asc)
      .limit(10)
    try {
      IvfProbeRewrite.registerRouted(IvfProbeRewrite.RoutedConfig(
        model, nprobe = 8, sq8Dir, sq8Margin = 1000,
        idCol = "vec_id", vecCol = "embedding",
        panel = () => panel,
        tiers = Seq(
          Router.Tier("flat", present = true, filterCapable = true),
          Router.Tier("graph", present = true, filterCapable = true)),
        flatTier = "flat", ivfTier = "ivf", sq8Tier = "sq8",
        recallTarget = 0.9, memoryBudget = None,
        fingerprintRoots = Seq(dir, sq8Dir),
        graphTier = "graph",
        graphServe = Some((_, q, k) =>
          GraphAnn.beamSearch(adj, e, "vec_id", "embedding", q, entryId,
            k, beamWidth = 8, rounds = 6, degree = 8))))
      assert(IvfProbeRewrite.routedDecision(spark, dir) == Some("graph"))
      // the documented boundary: a walk is a driver loop, not a plan —
      // the rewrite must leave the exact plan completely untouched (no
      // injected probe Filter, no spliced quantized scan; the relation
      // schema legitimately CONTAINS a cluster_id column)
      val optPlan = naive.queryExecution.optimizedPlan
      assert(optPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.references.exists(_.name == "cluster_id") => f
      }.isEmpty, s"graph route must not inject the probe:\n$optPlan")
      assert(!optPlan.toString().contains("dequant_l2_sq"),
        s"graph route must not splice the sq8 plan:\n$optPlan")
      // the dispatcher honors the decision through the walk thunk
      val served = IvfProbeRewrite.serveRouted(spark, dir, query, 10)(naive)
        .select("vec_id").as[Long].collect().toSeq
      val walk = GraphAnn.beamSearch(adj, e, "vec_id", "embedding",
          query, entryId, 10, beamWidth = 8, rounds = 6, degree = 8)
        .select("vec_id").as[Long].collect().toSeq
      assert(served == walk && served.nonEmpty)
    } finally {
      IvfProbeRewrite.clear()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("routed sparse tier: modality-gated decision, thunk dispatch, " +
      "and the vector path DECLINES onto flat untouched") {
    import graft.search.{Router, SparseVec}
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = "/tmp/graft_routed_sparse_test"
    val sq8Dir = "/tmp/graft_routed_sparse_sq8"
    val spIdx = "/tmp/graft_routed_sparse_idx"
    Seq(dir, sq8Dir, spIdx).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    val model = IvfIndex.build(e, "embedding", dir, nlist = 8)
    graft.search.Quantize.quantizedTable(e, "embedding", "vec_id")
      .write.mode("overwrite").parquet(sq8Dir)
    SparseVec.build(e, "vec_id", "embedding", topN = 8, spIdx)
    val n = e.count()
    // handcrafted panel: the sparse tier is cheapest, but carries the
    // "sparse" modality — a VECTOR query must not route to it
    val panel = Seq(
      ("flat", 1.0, n, 0L),
      ("sparse_wand", 1.0, n / 10, 0L))
      .toDF("tier", "recall", "cost", "mem_bytes")
    val qp = SparseVec.postings(e.where(col("vec_id") === 0),
        "vec_id", "embedding", topN = 8)
      .select(col("dim"), col("w")).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    try {
      IvfProbeRewrite.registerRouted(IvfProbeRewrite.RoutedConfig(
        model, nprobe = 8, sq8Dir, sq8Margin = 1000,
        idCol = "vec_id", vecCol = "embedding",
        panel = () => panel,
        tiers = Seq(
          Router.Tier("flat", present = true, filterCapable = true),
          Router.Tier("sparse_wand", present = true,
            filterCapable = true, modality = "sparse")),
        flatTier = "flat", ivfTier = "ivf", sq8Tier = "sq8",
        recallTarget = 0.9, memoryBudget = None,
        fingerprintRoots = Seq(dir, sq8Dir, spIdx),
        sparseTier = "sparse_wand",
        sparseServe = Some((sp, q, k) =>
          SparseVec.searchWandIndex(sp, spIdx,
            sp.createDataFrame(q).toDF("dim", "w"), "vec_id", k)),
        sparseBulkServe = Some((sp, q, k) =>
          SparseVec.searchBulkWandIndex(sp, spIdx, q, "vec_id", k))))
      // the modality gate keys the decision: same artifacts, two
      // modalities, two different tiers
      assert(IvfProbeRewrite.routedDecisionSparse(spark, dir)
        == Some("sparse_wand"))
      assert(IvfProbeRewrite.routedDecision(spark, dir) == Some("flat"))
      // sparse dispatch serves the WAND thunk's rows
      val served = IvfProbeRewrite.serveRoutedSparse(spark, dir, qp, 10) {
        fail("sparse route must not serve the naive branch"); null
      }.select("vec_id").as[Long].collect().toSeq
      val direct = SparseVec.searchWandIndex(spark, spIdx,
          spark.createDataFrame(qp).toDF("dim", "w"), "vec_id", 10)
        .select("vec_id").as[Long].collect().toSeq
      assert(served == direct && served.nonEmpty)
      // BULK arity dispatches through the SAME modality gate (round
      // 16): the whole batch serves in the registrant's bulk thunk
      val qpB = SparseVec.postings(e.where(col("vec_id").isin(0, 1)),
          "vec_id", "embedding", topN = 8)
        .select(col("vec_id").cast("long").as("qid"), col("dim"),
          col("w"))
      val servedB =
        IvfProbeRewrite.serveRoutedSparseBulk(spark, dir, qpB, 5) {
          fail("sparse bulk route must not serve the naive branch"); null
        }.select("qid", "vec_id").as[(Long, Long)].collect().toSeq
      val directB = SparseVec.searchBulkWandIndex(spark, spIdx, qpB,
          "vec_id", 5)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSeq
      assert(servedB == directB && servedB.nonEmpty)
      // a sparse config WITHOUT a bulk thunk DECLINES the bulk arity
      // onto naive while the single-query arity still dispatches
      IvfProbeRewrite.registerRouted(IvfProbeRewrite.RoutedConfig(
        model, nprobe = 8, sq8Dir, sq8Margin = 1000,
        idCol = "vec_id", vecCol = "embedding",
        panel = () => panel,
        tiers = Seq(
          Router.Tier("flat", present = true, filterCapable = true),
          Router.Tier("sparse_wand", present = true,
            filterCapable = true, modality = "sparse")),
        flatTier = "flat", ivfTier = "ivf", sq8Tier = "sq8",
        recallTarget = 0.9, memoryBudget = None,
        fingerprintRoots = Seq(dir, sq8Dir, spIdx),
        sparseTier = "sparse_wand",
        sparseServe = Some((sp, q, k) =>
          SparseVec.searchWandIndex(sp, spIdx,
            sp.createDataFrame(q).toDF("dim", "w"), "vec_id", k))))
      val bulkDeclined =
        IvfProbeRewrite.serveRoutedSparseBulk(spark, dir, qpB, 5) {
          e.limit(4).select(col("vec_id"))
        }
      assert(bulkDeclined.count() == 4)
      val singleStill =
        IvfProbeRewrite.serveRoutedSparse(spark, dir, qp, 10) {
          fail("single arity must still dispatch"); null
        }.select("vec_id").as[Long].collect().toSeq
      assert(singleStill == direct)
      // the VECTOR path declines onto flat: naive plan untouched
      val query = e.where(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      def naive = spark.read.parquet(IvfIndex.dataDir(dir))
        .select(col("vec_id"),
          round(VectorFunctions.l2Sq(col("embedding"), typedlit(query)), 4)
            .as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(10)
      val optPlan = naive.queryExecution.optimizedPlan
      assert(optPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.references.exists(_.name == "cluster_id") => f
      }.isEmpty, s"flat route must not inject the probe:\n$optPlan")
      // a config WITHOUT a sparse thunk serves the naive branch
      IvfProbeRewrite.registerRouted(IvfProbeRewrite.RoutedConfig(
        model, nprobe = 8, sq8Dir, sq8Margin = 1000,
        idCol = "vec_id", vecCol = "embedding",
        panel = () => panel,
        tiers = Seq(
          Router.Tier("flat", present = true, filterCapable = true)),
        flatTier = "flat", ivfTier = "ivf", sq8Tier = "sq8",
        recallTarget = 0.9, memoryBudget = None,
        fingerprintRoots = Seq(dir, sq8Dir)))
      val viaNaive = IvfProbeRewrite.serveRoutedSparse(spark, dir, qp, 3) {
        e.limit(3).select(col("vec_id"))
      }
      assert(viaNaive.count() == 3)
    } finally {
      IvfProbeRewrite.clear()
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
