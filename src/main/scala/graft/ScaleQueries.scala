package graft

import graft.QueryDsl._
import graft.core.Tables
import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Shuffle-strategy surface: salting for skew, bucketing for co-located
  * joins, set operations. */
object ScaleQueries {
  /** Salted join must produce exactly the plain join's aggregate. */
  private val saltedJoinAgg = Q(
    "salted_join_agg",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_linenumber")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      SaltedJoin.inner(l, o, "l_orderkey", "o_orderkey",
          saltBy = "l_linenumber", nSalts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("o_orderpriority").asc)
    },
    Some("""
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority ASC
    """))

  /** One-time layout build per JVM+sfDir (the sorted/zorder/partitioned/
    * geo convention, factored once): key the /tmp dir by name + fixture
    * hash, probe its _SUCCESS, write only when absent — timed repeats
    * measure the pruned SCAN, never the write. Returns the dir. */
  private def ensureLayout(s: org.apache.spark.sql.SparkSession,
                           dir: String, name: String)
                          (write: String => Unit): String = {
    val out = s"/tmp/graft_${name}_${math.abs(dir.hashCode)}"
    val p = new org.apache.hadoop.fs.Path(out + "/_SUCCESS")
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) write(out)
    out
  }

  /** Bucketed co-located join: both sides written bucketBy(8, key) via
    * saveAsTable, joined without a shuffle exchange (bucket pruning of the
    * join exchange is the point; the aggregate result is the oracle). */
  private val bucketedJoinAgg = Q(
    "bucketed_join_agg",
    (s, dir) => {
      // Bucketed-table setup is once per JVM+sfDir (like the IVF index
      // build): the catalog remembers the table within a session, and a
      // FRESH JVM clears the stale warehouse dir first (the in-memory
      // catalog forgets tables across sessions while the dir persists,
      // which would otherwise raise LOCATION_ALREADY_EXISTS). Timed
      // repeats therefore measure the co-located JOIN — the operator
      // under test — not the one-time write.
      val suffix = math.abs(dir.hashCode).toString
      def ensure(name: String)(write: String => Unit): Unit =
        if (!s.catalog.tableExists(name)) {
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), name)
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
          write(name)
        }
      ensure(s"graft_orders_bucketed_$suffix") { n =>
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(n)
      }
      ensure(s"graft_lineitem_bucketed_$suffix") { n =>
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(n)
      }
      val o = s.table(s"graft_orders_bucketed_$suffix")
      val l = s.table(s"graft_lineitem_bucketed_$suffix")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderpriority").asc)
    },
    Some("""
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(l_quantity), 2) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority ASC
    """))

  /** INTERSECT / EXCEPT set operations. */
  private val setOpsCustomers = Q(
    "set_ops_customers",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val building = c.where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val withP = c.join(o.where(col("o_orderstatus") === "P"),
          c("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
      building.intersect(withP).withColumn("tag", lit("both"))
        .unionByName(building.except(withP).withColumn("tag", lit("only_building")))
        .select("tag", "c_custkey")
        .orderBy(col("tag").asc, col("c_custkey").asc)
    },
    Some("""
      WITH building AS (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING'),
      withp AS (SELECT c_custkey FROM customer
                WHERE EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'P'))
      SELECT 'both' AS tag, c_custkey
      FROM (SELECT c_custkey FROM building INTERSECT
            SELECT c_custkey FROM withp)
      UNION ALL
      SELECT 'only_building' AS tag, c_custkey
      FROM (SELECT c_custkey FROM building EXCEPT
            SELECT c_custkey FROM withp)
      ORDER BY tag ASC, c_custkey ASC
    """))

  /** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter):
    * a selective filter on one join side is turned into a bloom filter
    * that prunes the other side's rows BEFORE the join shuffle, cutting
    * shuffle bytes by ~the filter's selectivity. The sweet spot at 100 TB
    * is a creation side that is small-but-not-broadcastable (100 MB-1 GB
    * of keys → a ~10-20 MB bloom), so the demo pins that shape by
    * disabling auto-broadcast; bloom false positives only cost a little
    * extra shuffle — join results stay exact, which is what the oracle
    * checks. Configs are scoped to a child session (`newSession` shares
    * the SparkContext but owns its SQLConf) so no other query's plan is
    * affected. PlanSpec asserts `might_contain` actually lands in the
    * lineitem-side filter. */
  private val bloomFilterJoin = Q(
    "bloom_filter_join",
    (s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = Tables.orders(s2, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val l = Tables.lineitem(s2, dir)
        .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("l_returnflag").asc)
    },
    Some("""
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY l_returnflag ORDER BY l_returnflag ASC
    """))

  /** Sort-clustered layout + static scan pruning: events rewritten
    * `repartitionByRange(ts).sortWithinPartitions(ts)` (the poor man's
    * Z-order for a single sort key), then a 1-day predicate over the
    * 30-day span. Because each file covers a narrow ts range, parquet
    * min/max footer + row-group stats let the pushed filter skip ~29/30
    * of the data without reading it — the layout decision IS the
    * optimization. One-time build per JVM+sfDir (same convention as the
    * bucketed tables): timed repeats measure the pruned scan, not the
    * write. */
  private val sortedScanPrune = Q(
    "sorted_scan_prune",
    (s, dir) => {
      val out = ensureLayout(s, dir, "sorted_events") { path =>
        Tables.events(s, dir)
          .repartitionByRange(16, col("ts"))
          .sortWithinPartitions(col("ts"))
          .write.mode("overwrite").parquet(path)
      }
      s.read.parquet(out)
        .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type").asc)
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-11 00:00:00'
      GROUP BY event_type ORDER BY event_type ASC
    """))

  /** 16-bit × 16-bit Morton (Z-order) interleave — bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Pure Catalyst integer ops; the
    * bits are disjoint so the reduce is `+`. */
  private[graft] def morton16(a: org.apache.spark.sql.Column,
                              b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Geo radius search — the Milvus 2.6 GEOMETRY family's core query
    * (ST_DWITHIN: ALL entities within r of a point), Spark-first: each
    * user's deterministic (lat, lon) — an integer-arithmetic synthetic
    * projection of the fixture, identical in both engines — lands in a
    * (lat, lon) Z-ORDERED layout (round 14; [[morton16]] over the
    * centi-degree integer grid — the same bit-interleave
    * `zorder_scan_prune` demonstrates on events), so row-group min/max
    * stats stay tight on BOTH axes and BOTH bbox edges prune files —
    * the lat-sorted round-12 layout pruned on lat only, leaving the
    * lon predicate a full-stripe filter. The radius query prefilters
    * by a BOUNDING BOX that is a true SUPERSET of the spherical cap
    * (lat half-width r/111° over-covers the r/R-radian cap; lon
    * half-width is the exact cap extent asin(sin(r/R)/cos(qlat)) —
    * the planar 1/cos(qlat) widening UNDER-covers near the cap's
    * corners and would silently drop in-radius points), pushed to the
    * scan as plain range predicates (PlanSpec pins both axes pushed);
    * only bbox survivors pay the exact haversine verify. The result is
    * the radius SET (ordered only for the deterministic hash) —
    * ST_DWITHIN semantics, not a top-k. That two-phase shape (cheap
    * pushed prefilter → exact trig on survivors) is every geo engine's
    * plan; at 100 TB the z-order cells the bbox intersects are what is
    * read, not the planet. Haversine is rounded (4 dp ≈ 0.1 m) with
    * the +1e-9 epsilon — the libm-parity discipline every ln/exp
    * oracle here uses. */
  private val geoRadiusSearch = Q(
    "geo_radius_search",
    (s, dir) => {
      val out = ensureLayout(s, dir, "geo_pts_z") { path =>
        // z-value over the exact centi-degree integers the lat/lon
        // derive from (lat+85)*100 = uid*9973%17000 < 2^15,
        // (lon+180)*100 = uid*7919%36000 < 2^16 — both fit morton16
        val z = morton16(col("user_id") * 9973 % 17000,
          col("user_id") * 7919 % 36000)
        Tables.events(s, dir).select(col("user_id")).distinct()
          .select(col("user_id"),
            ((col("user_id") * 9973 % 17000) / 100.0 - 85.0).as("lat"),
            ((col("user_id") * 7919 % 36000) / 100.0 - 180.0).as("lon"))
          .repartitionByRange(8, z)
          .sortWithinPartitions(z)
          .write.mode("overwrite").parquet(path)
      }
      // query anchor = user 1's own point (present at every SF, so the
      // result is never empty): ((9973 % 17000)/100 − 85,
      // (7919 % 36000)/100 − 180) = (14.73, −100.81)
      val (qLat, qLon, rKm) = (14.73, -100.81, 3000.0)
      val dLat = rKm / 111.0 // ≥ degrees(r/R): lat over-covers the cap
      val dLon = math.toDegrees(math.asin(
        math.sin(rKm / 6371.0) / math.cos(math.toRadians(qLat))))
      val hav = {
        val rLat = radians(col("lat")); val rQLat = radians(lit(qLat))
        val a = pow(sin((rLat - rQLat) / 2), 2) +
          cos(rLat) * cos(rQLat) *
            pow(sin((radians(col("lon")) - radians(lit(qLon))) / 2), 2)
        lit(2 * 6371.0) * asin(sqrt(a))
      }
      s.read.parquet(out)
        .where(col("lat").between(qLat - dLat, qLat + dLat) &&
          col("lon").between(qLon - dLon, qLon + dLon))
        .withColumn("dist_km", round(hav + lit(1e-9), 4))
        .where(col("dist_km") <= rKm)
        .select("user_id", "lat", "lon", "dist_km")
        .orderBy(col("dist_km").asc, col("user_id").asc)
    },
    Some("""
      WITH pts AS (SELECT DISTINCT user_id,
                          (user_id * 9973 % 17000) / 100.0 - 85.0 AS lat,
                          (user_id * 7919 % 36000) / 100.0 - 180.0 AS lon
                   FROM events),
      cand AS (SELECT * FROM pts
               WHERE lat BETWEEN 14.73 - 3000.0/111.0
                             AND 14.73 + 3000.0/111.0
                 AND lon BETWEEN
                   -100.81 - degrees(asin(sin(3000.0/6371.0)
                                          / cos(radians(14.73))))
                   AND
                   -100.81 + degrees(asin(sin(3000.0/6371.0)
                                          / cos(radians(14.73))))),
      d AS (SELECT user_id, lat, lon,
                   round(2 * 6371.0 * asin(sqrt(
                     sin((radians(lat) - radians(14.73)) / 2)^2
                     + cos(radians(lat)) * cos(radians(14.73))
                       * sin((radians(lon) - radians(-100.81)) / 2)^2))
                     + 1e-9, 4) AS dist_km
            FROM cand)
      SELECT user_id, lat, lon, dist_km FROM d
      WHERE dist_km <= 3000.0
      ORDER BY dist_km ASC, user_id ASC
    """))

  /** Z-order (Morton-curve) layout for MULTI-column scan pruning — the
    * step past sorted_scan_prune's single-key clustering: events are
    * written range-partitioned and sorted by the bit-interleave of
    * (user_id, epoch-minute), so row-group min/max ranges stay tight on
    * BOTH columns simultaneously and a predicate on either (or both)
    * skips most of the file without reading it. A single-column sort
    * gives perfect pruning on its key and none on the other; the
    * space-filling curve trades a little of each for locality on both —
    * the standard warehouse layout for two-dimensional access patterns
    * (Delta/Iceberg OPTIMIZE ZORDER). The z-value is computed as a pure
    * Catalyst expression and exists only during the write; correctness
    * is layout-independent, which is exactly what the oracle checks.
    * One-time build per JVM+sfDir (the sorted/bucketed convention):
    * timed repeats measure the pruned scan, not the write. */
  private val zorderScanPrune = Q(
    "zorder_scan_prune",
    (s, dir) => {
      val out = ensureLayout(s, dir, "zorder_events") { path =>
        val z = morton16(col("user_id"),
          (unix_timestamp(col("ts")) / 60).cast("long"))
        Tables.events(s, dir)
          .repartitionByRange(16, z)
          .sortWithinPartitions(z)
          .write.mode("overwrite").parquet(path)
      }
      s.read.parquet(out)
        .where(col("user_id").between(10, 40) &&
          col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type").asc)
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total_value
      FROM events
      WHERE user_id BETWEEN 10 AND 40
        AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        AND ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY event_type ORDER BY event_type ASC
    """))

  /** Hive-style DIRECTORY partition pruning — the third pruning
    * mechanism next to sorted_scan_prune (file/row-group min-max stats)
    * and zorder_scan_prune (multi-column stats): events written
    * `partitionBy(event_type)`, so an equality predicate eliminates
    * whole directories at PLANNING time (`PartitionFilters` on the
    * scan — zero I/O for pruned partitions, not even footer reads; the
    * PlanSpec pin asserts the filter lands in PartitionFilters, not
    * PushedFilters). The warehouse default for low-cardinality hot
    * predicates; stats pruning handles the high-cardinality rest.
    * One-time build per JVM+sfDir (the sorted/bucketed convention). */
  private val partitionedScanPrune = Q(
    "partitioned_scan_prune",
    (s, dir) => {
      val out = ensureLayout(s, dir, "part_events") { path =>
        Tables.events(s, dir)
          .write.partitionBy("event_type").mode("overwrite").parquet(path)
      }
      s.read.parquet(out)
        .where(col("event_type") === "purchase")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type").asc)
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total_value,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY event_type ORDER BY event_type ASC
    """))

  val all: Seq[Q] = Seq(saltedJoinAgg, bucketedJoinAgg, setOpsCustomers,
    bloomFilterJoin, sortedScanPrune, zorderScanPrune,
    partitionedScanPrune, geoRadiusSearch)
}
