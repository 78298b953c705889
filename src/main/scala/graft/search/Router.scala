package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Serving-tier ROUTER — the choice among this engine's ~12 serving
  * tiers (flat / norm-pruned / IVF × metrics / SQ8 / PQ / OPQ / RQ /
  * asym-binary / graph × metrics / LSH) made an OPERATOR instead of a
  * README guide: Milvus's planner does this internally per query; on a
  * lakehouse the decision must be inspectable and replayable, so it is
  * a table, not a scalar — the `index_maintenance_plan` discipline
  * applied to serving.
  *
  * Inputs:
  *  - `panel` (tier, recall, cost): the MEASURED recall/cost table —
  *    cost in "rows touched per query" (flat = corpus rows, IVF = avg
  *    probed-partition rows, graph = the walk's visited-budget bound),
  *    recall against exact top-k on the same queries. A build-once
  *    tuning artifact, like the nprobe/beam autotune tables; the
  *    measurement arithmetic itself is oracle-replayed by the
  *    recall-report/autotune entries — HERE the oracle replays the
  *    DECISION from the staged panel.
  *  - `tiers` (name, present, filterCapable): artifact presence and
  *    whether the tier has an indexed-filter path (the round-10
  *    filter × index matrix: flat/IVF/graph do).
  *  - query shape: `selectivity` (1.0 = unfiltered) and `recallTarget`.
  *
  * Rules, in order (pure arithmetic, replayed by the oracle):
  *  1. a tier is ELIGIBLE iff its artifact is present, AND (the query
  *     is unfiltered OR the tier is filter-capable), AND (selectivity ≥
  *     `exactFloorSelectivity` OR the tier is 'flat') — below the floor
  *     the filtered subset is so small that exact-over-survivors beats
  *     any index ([[GraphAnn.filteredSearchAuto]]'s dispatch rule,
  *     promoted to the router).
  *  2. a tier MEETS the target iff eligible AND panel recall ≥ target.
  *  3. CHOSEN = the meeting tier with minimum cost, tier-name
  *     tie-break; if none meets, the eligible tier with the highest
  *     recall (cost tie-break) — degrade predictably, never refuse.
  *
  * Returns one row per panel tier: (tier, present, filter_capable,
  * eligible, recall, cost, meets_target, chosen), tier-ascending. */
object Router {
  final case class Tier(name: String, present: Boolean,
                        filterCapable: Boolean)

  def plan(spark: SparkSession, panel: DataFrame, tiers: Seq[Tier],
           selectivity: Double, recallTarget: Double,
           exactFloorSelectivity: Double = 0.0625): DataFrame = {
    require(selectivity > 0 && selectivity <= 1.0)
    val byName = tiers.map(t => t.name -> t).toMap
    val p = panel.select(col("tier"), col("recall").cast("double"),
        col("cost").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    val rows = p.map { case (name, recall, cost) =>
      val t = byName.getOrElse(name, Tier(name, present = false,
        filterCapable = false))
      val eligible = t.present &&
        (selectivity >= 1.0 || t.filterCapable) &&
        (selectivity >= exactFloorSelectivity || name == "flat")
      val meets = eligible && recall >= recallTarget
      (name, t.present, t.filterCapable, eligible, recall, cost, meets)
    }
    val chosen: Option[String] = {
      val meeting = rows.filter(_._7)
      if (meeting.nonEmpty)
        Some(meeting.minBy { case (n, _, _, _, _, c, _) => (c, n) }._1)
      else {
        val eligible = rows.filter(_._4)
        if (eligible.isEmpty) None
        else Some(eligible
          .minBy { case (n, _, _, _, r, c, _) => (-r, c, n) }._1)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (n, pr, fc, el, r, c, m) =>
          Row(n, pr, fc, el, r, c, m, chosen.contains(n))
        }.toSeq, 1),
      StructType(Seq(
        StructField("tier", StringType, nullable = false),
        StructField("present", BooleanType, nullable = false),
        StructField("filter_capable", BooleanType, nullable = false),
        StructField("eligible", BooleanType, nullable = false),
        StructField("recall", DoubleType, nullable = false),
        StructField("cost", LongType, nullable = false),
        StructField("meets_target", BooleanType, nullable = false),
        StructField("chosen", BooleanType, nullable = false))))
  }
}
