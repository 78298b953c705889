package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Maintenance scheduling for a serving index — the policy layer over
  * round-9's observability ([[IndexAudit.versionChecks]], the balance
  * stats) and maintenance verbs ([[IvfIndex.compactVersions]],
  * [[Tombstones.compact]], [[IvfIndex.rebalance]]): Milvus runs this
  * loop internally (segment compaction + reindex triggers); on a
  * lakehouse the operator owns it, so the trigger arithmetic must be
  * inspectable and replayable, not a heuristic buried in a scheduler.
  *
  * Every decision is `metric > threshold` in ABSOLUTE ROWS derived
  * from the artifact itself:
  *  - `compact_versions`: superseded rows > versionDebtFrac · artifact
  *    rows — the latest-wins overlay every serve pays is now material.
  *  - `compact_tombstones`: tombstoned keys > tombstoneFrac · artifact
  *    rows — the serve-time anti-join's broadcast side is growing.
  *  - `rebalance`: max list size > skewFactor · avg list size — probes
  *    of the hot list dominate serving cost.
  *
  * Inputs are three bounded aggregates (the 4-row version counters,
  * one row of list-size stats); the plan row set is assembled
  * driver-side from those — the same bounded-handoff discipline as the
  * query-vector fetch. */
object Maintenance {
  /** One row per candidate action: (action, metric, threshold,
    * triggered), action-ascending. Integer thresholds floor the
    * fraction so the replaying oracle needs no float comparison. */
  def plan(spark: SparkSession, indexDir: String, idCol: String,
           versionDebtFrac: Double = 0.10, tombstoneFrac: Double = 0.05,
           skewFactor: Double = 4.0): DataFrame = {
    val counters = IndexAudit.versionChecks(spark, indexDir, idCol)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = spark.read.option("mergeSchema", "true")
      .parquet(IvfIndex.dataDir(indexDir))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .agg(sum(col("sz")).as("total"), max(col("sz")).as("mx"),
        count(lit(1)).as("nlists"))
      .collect()(0)
    // an empty data dir aggregates to NULLs — degrade to zeros (no
    // action triggers on an empty index) instead of an NPE
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val maxList = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val nLists = stats.getLong(2)
    val avgList = total / math.max(1L, nLists)
    def row(action: String, metric: Long, threshold: Long) =
      Row(action, metric, threshold, metric > threshold)
    val rows = Seq(
      row("compact_tombstones", counters("ver_tombstone_keys"),
        (total * tombstoneFrac).toLong),
      row("compact_versions", counters("ver_superseded_rows"),
        (total * versionDebtFrac).toLong),
      row("rebalance", maxList, (avgList * skewFactor).toLong))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("action", StringType, nullable = false),
        StructField("metric", LongType, nullable = false),
        StructField("threshold", LongType, nullable = false),
        StructField("triggered", BooleanType, nullable = false))))
  }
}
