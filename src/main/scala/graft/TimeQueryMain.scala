package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one query N times in a warm JVM (Bench runs each
  * query once, so cold-start noise dominates single numbers).
  * Usage: tools/run.sh graft.TimeQueryMain <queryName> [sfDir] [n]
  */
object TimeQueryMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    // same default as Bench so per-query numbers are comparable to the
    // bench's without remembering to pass the env var
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
