package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see /root/repo/TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst column pruning and
  * predicate pushdown reach the file source (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`). At cluster scale the same
  * loaders work unchanged against a directory of many files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-schema cache (round 16, fixed-cost audit): every
    * `spark.read.parquet` without a schema runs a 1-task footer-read
    * job at plan time, and the fixture tables are read by nearly every
    * registry entry — hundreds of identical footer jobs per bench
    * pass. Fixtures are IMMUTABLE for a given dir (TESTDATA.md), so
    * the first read infers and later reads pass the cached schema.
    * Keyed by full path: two fixture dirs (or driver generations with
    * different `ts` physical types — see [[normalizeTs]]) never share
    * an entry. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = s"$dir/$name.parquet"
    val cached = schemaCache.get(p)
    if (cached != null) spark.read.schema(cached).parquet(p)
    else {
      val df = spark.read.parquet(p)
      schemaCache.put(p, df.schema)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events fixture's `ts` physical type has varied across driver
    * generations: parquet TIMESTAMP(NANOS) (Spark 4 reads it as a
    * nanos LONG under `spark.sql.legacy.parquet.nanosAsLong=true`, set
    * in every session builder here) and parquet TIMESTAMP(MICROS)
    * without UTC adjustment (Spark reads TIMESTAMP_NTZ). DuckDB sees a
    * naive timestamp either way, so normalize every variant to a
    * session-TZ TIMESTAMP (sessions run UTC): nanos-long → integer
    * `div` (never double division — epoch-nanos exceed double's 2^53
    * exact-integer range) → `timestamp_micros`; NTZ → cast. */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case _                => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture as a temp view (for spark.sql usage). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
