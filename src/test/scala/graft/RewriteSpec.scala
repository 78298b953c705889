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
}
