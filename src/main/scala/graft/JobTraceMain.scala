package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (round 16): run one registry entry once in a warm
  * session and print every Spark job it fires — job id, wall ms, and
  * the job's first stage callsite — so a per-entry fixed-cost audit
  * can name the actions instead of counting blanks.
  * Usage: tools/run.sh graft.JobTraceMain <queryName> [sfDir] [passes]
  */
object JobTraceMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev knob: comma list of k=v Spark confs to A/B a setting without
    // touching the contract mains, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.files.minPartitionNum=1"
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(",").toSeq.filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v) })
      .getOrElse(Nil)
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          val nstages = js.stageInfos.size
          val ntasks = js.stageInfos.map(_.numTasks).sum
          starts.put(js.jobId,
            (System.nanoTime(), s"stages=$nstages tasks=$ntasks $site"))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
            val ms = (System.nanoTime() - t0) / 1e6
            lines.add(f"[jobtrace] job=${je.jobId}%4d ${ms}%8.1f ms  $desc")
          }
        }
      })
    // warm-up pass(es) first so the traced pass is the steady state
    (1 until passes).foreach { _ =>
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
    }
    Thread.sleep(300); lines.clear()
    val t0 = System.nanoTime()
    val c = SparkEntry.queries(name)(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.forEach(l => println(l))
    println(f"[jobtrace] TOTAL $dt%.2f s ($c rows), jobs=${lines.size}")
    spark.stop()
  }
}
