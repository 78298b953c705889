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
  private def mkRow(action: String, metric: Long, threshold: Long) =
    Row(action, metric, threshold, metric > threshold)

  private def toDf(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("action", StringType, nullable = false),
        StructField("metric", LongType, nullable = false),
        StructField("threshold", LongType, nullable = false),
        StructField("triggered", BooleanType, nullable = false))))

  /** The IVF family's three core trigger rows, as raw Rows (shared by
    * [[plan]] and [[planFull]]). */
  private def ivfRows(spark: SparkSession, indexDir: String, idCol: String,
                      versionDebtFrac: Double, tombstoneFrac: Double,
                      skewFactor: Double): Seq[Row] = {
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
    Seq(
      mkRow("compact_tombstones", counters("ver_tombstone_keys"),
        (total * tombstoneFrac).toLong),
      mkRow("compact_versions", counters("ver_superseded_rows"),
        (total * versionDebtFrac).toLong),
      mkRow("rebalance", maxList, (avgList * skewFactor).toLong))
  }

  /** One row per candidate action: (action, metric, threshold,
    * triggered), action-ascending. Integer thresholds floor the
    * fraction so the replaying oracle needs no float comparison. */
  def plan(spark: SparkSession, indexDir: String, idCol: String,
           versionDebtFrac: Double = 0.10, tombstoneFrac: Double = 0.05,
           skewFactor: Double = 4.0): DataFrame =
    toDf(spark, ivfRows(spark, indexDir, idCol, versionDebtFrac,
      tombstoneFrac, skewFactor))

  /** The observe→plan loop over EVERY index family (round 10 — the
    * three-verb [[plan]] read a third of the audit surface; this reads
    * the rest): the IVF core rows plus
    *
    *  - `consolidate_graph` — adjacency rows touching a dead node
    *    (`graphDeadKeys`, the graph index's tombstone set) exceed
    *    `graphDebtFrac` of the artifact: tombstoned nodes still do
    *    routing work on every walk until
    *    [[GraphAnn.consolidateDeletes]] folds them out.
    *  - `compact_text_tombstones` — the lexical family's tombstone
    *    keys ([[Tombstones]] under `textIndexDir`, masking BM25 and
    *    phrase serving) exceed `textTombstoneFrac` of the doclen
    *    table's documents: each serve pays the anti-join until
    *    [[Tombstones.compact]] folds postings + doclen (+ positions).
    *  - `reconcile` — [[IndexAudit.ivfChecks]]' drift direction:
    *    artifact ids absent from `liveCorpus` (orphans) plus corpus
    *    ids absent from the artifact (missing), threshold 0 — any
    *    drift means [[IndexSync.reconcileIvf]] has work.
    *  - `refresh_radii` — [[IndexAudit.radiiChecks]]'
    *    `ivf_radius_violations` PLUS `ivf_radius_missing`, threshold 0:
    *    a violated covering radius makes range/exact-via-IVF serving
    *    WRONG, not slow, so the repair ([[IvfIndex.refreshRadii]])
    *    schedules on the first violation; a missing radius (a pre-radii
    *    index, or a cluster the fold never saw) is slow-not-wrong but
    *    the same verb cures it, so it schedules too — and a LEGACY
    *    index with no radii table now plans `refresh_radii` instead of
    *    crashing (the round-10 ADVICE finding).
    *  - `reelect_entries` (round 11) — [[IndexAudit.entryChecks]]'
    *    `entry_points_dead`, threshold 0: a tombstoned or
    *    consolidation-stripped entry point strands every walk seeded
    *    there ([[GraphAnn.reelectEntries]] is the verb, or run the
    *    consolidation through
    *    [[GraphAnn.consolidateDeletesWithEntries]]).
    *  - `compact_term_segments` (round 11) — the sorted-term layout's
    *    segment count ([[TermIndex.segments]], one listStatus) vs
    *    `segmentCap`: every prefix query pays one footer read per
    *    intersecting segment, so segment debt is a serving cost
    *    ([[TermIndex.compactSegments]] folds; Lucene's merge policy is
    *    this row).
    *
    * Every metric/threshold stays `metric > threshold` in absolute
    * rows derived from artifacts the caller can inspect — bounded
    * aggregates, driver-assembled rows, same as [[plan]]. */
  def planFull(spark: SparkSession, indexDir: String, idCol: String,
               vecCol: String, liveCorpus: DataFrame, adj: DataFrame,
               graphDeadKeys: DataFrame, textIndexDir: String,
               entries: DataFrame, termIndexDir: String,
               versionDebtFrac: Double = 0.10,
               tombstoneFrac: Double = 0.05, skewFactor: Double = 4.0,
               graphDebtFrac: Double = 0.05,
               textTombstoneFrac: Double = 0.05,
               segmentCap: Int = 2): DataFrame = {
    val base = ivfRows(spark, indexDir, idCol, versionDebtFrac,
      tombstoneFrac, skewFactor)
    // graph: dead-touching edge rows vs the artifact's edge count —
    // two broadcast EQUI semi-joins unioned (an OR-join would both
    // double-count a both-endpoints-dead edge and plan as a nested
    // loop); distinct is safe because (src, dst) is the edge identity
    val dead = broadcast(graphDeadKeys
      .select(col(graphDeadKeys.columns.head).cast("long").as("__dead"))
      .distinct())
    val edges = adj.count()
    val deadEdges = adj
      .join(dead, col("src") === col("__dead"), "left_semi")
      .unionByName(adj.join(dead, col("dst") === col("__dead"),
        "left_semi"))
      .select(col("src"), col("dst")).distinct().count()
    val graphRow = mkRow("consolidate_graph", deadEdges,
      (edges * graphDebtFrac).toLong)
    // text: tombstone keys vs the doclen table's document count
    val nDocs = spark.read.parquet(Bm25Index.doclenDir(textIndexDir))
      .agg(countDistinct(col("id"))).collect()(0).getLong(0)
    val textRow = mkRow("compact_text_tombstones",
      Tombstones.count(spark, textIndexDir),
      (nDocs * textTombstoneFrac).toLong)
    // reconcile: both drift directions against the live corpus. The
    // artifact side is tombstone-MASKED, exactly like
    // [[IndexSync.reconcileIvf]]'s own diffs — so running the verb
    // clears the trigger (already-recorded orphan tombstones stop
    // counting; appended missing rows appear), the idempotency the
    // verb documents.
    val artIds = Tombstones.mask(
      spark.read.option("mergeSchema", "true")
        .parquet(IvfIndex.dataDir(indexDir))
        .select(col(idCol)).distinct(),
      spark, indexDir, idCol)
    val corpusIds = liveCorpus.select(col(idCol))
    val orphans = artIds.join(corpusIds, Seq(idCol), "left_anti").count()
    val missing = corpusIds.join(artIds, Seq(idCol), "left_anti").count()
    val reconcileRow = mkRow("reconcile", orphans + missing, 0L)
    // radii: violations (wrong answers) + missing (unaccelerated
    // clusters; = all of them on a legacy pre-radii index) — both cured
    // by refreshRadii, both schedule it
    val viol = IndexAudit.radiiChecks(spark, indexDir, vecCol)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val radiiRow = mkRow("refresh_radii",
      viol("ivf_radius_violations") + viol("ivf_radius_missing"), 0L)
    // graph entry liveness: dead/stranded seeds strand walks — verb is
    // re-election, threshold 0 (one adjacency semi-join scan)
    val entryDead = IndexAudit.entryChecks(entries, adj, graphDeadKeys)
      .collect()(0).getLong(1)
    val entryRow = mkRow("reelect_entries", entryDead, 0L)
    // lexical segment debt: one listStatus, no scan
    val segRow = mkRow("compact_term_segments",
      TermIndex.segments(spark,
        AliasedIndex.resolveDir(spark, termIndexDir)).size.toLong,
      segmentCap.toLong)
    toDf(spark,
      (base ++ Seq(graphRow, textRow, reconcileRow, radiiRow, entryRow,
        segRow))
        .sortBy(_.getString(0)))
  }
}
