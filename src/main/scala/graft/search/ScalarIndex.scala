package graft.search

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar secondary index for filtered vector search — the INVERTED /
  * BITMAP scalar-index family Milvus attaches to metadata fields
  * (reference essay doc/milvus介绍.md names the filtered-search mode;
  * src/app.py's Milvus client exposes `filter=` expressions): a
  * build-once parquet artifact mapping each VALUE of a low-cardinality
  * column to its row ids, laid out `partitionBy(value)` so a filter
  * resolves by DIRECTORY-pruned scan of the compact two-column artifact
  * without touching the vector corpus at all.
  *
  * The 100 TB shape: the id set for `label IN (…)` comes from a
  * ~16 B/row artifact whose matching partitions alone are read (the
  * same planning-time pruning the hive-partitioned collection scan
  * pins); the expensive vector table is then restricted by a semi-join
  * on id BEFORE any distance math. When the filter is selective the
  * semi-join side broadcasts; either way the corpus is never scanned
  * for a column it doesn't need. */
object ScalarIndex {
  def valuesDir(indexDir: String): String = s"$indexDir/scalar_postings"

  /** Build the (value, id) artifact, partitioned by value — one
    * directory per distinct value, prunable at planning time. Rebuild
    * per column-version; [[append]]-maintained like every other
    * artifact here (a parquet file append into the value's dir). */
  def build(df: DataFrame, idCol: String, valCol: String,
            indexDir: String): Unit =
    df.select(col(valCol).as("value"), col(idCol).cast("long").as("id"))
      .write.mode("overwrite").partitionBy("value")
      .parquet(valuesDir(indexDir))

  /** Incremental maintenance: file-append of a batch's (value, id)
    * rows into the partitioned layout — no rewrite, no re-read. */
  def append(batch: DataFrame, idCol: String, valCol: String,
             indexDir: String): Unit =
    batch.select(col(valCol).as("value"), col(idCol).cast("long").as("id"))
      .write.mode("append").partitionBy("value")
      .parquet(valuesDir(indexDir))

  /** The id set for `valCol IN (values)` — a directory-pruned scan of
    * the artifact's matching partitions only. */
  def ids(spark: SparkSession, indexDir: String,
          values: Seq[Any]): DataFrame =
    spark.read.parquet(valuesDir(indexDir))
      .where(col("value").isin(values: _*))
      .select(col("id"))

  /** The id set for `array_contains_all(col, values)` over an EXPLODED
    * element artifact ([[ids]]'s conjunctive sibling — Milvus 2.4's
    * third ARRAY filter verb): directory-pruned scan of the matching
    * element partitions, then one group-count requiring every distinct
    * value per id — the corpus is still never touched, and duplicate
    * (value, id) rows (an element file-appended twice) collapse in the
    * distinct count. */
  def idsAll(spark: SparkSession, indexDir: String,
             values: Seq[Any]): DataFrame = {
    val distinctVals = values.distinct
    spark.read.parquet(valuesDir(indexDir))
      .where(col("value").isin(distinctVals: _*))
      .groupBy(col("id"))
      .agg(countDistinct(col("value")).as("__nv"))
      .where(col("__nv") === distinctVals.length)
      .select(col("id"))
  }

  /** Exact filtered kNN with the filter resolved by the scalar index:
    * artifact partitions → id set → semi-join restriction of the
    * corpus → exact distance → top-k. Equals brute-force kNN over the
    * predicate's survivors (the spec pins it); the corpus scan reads
    * only (id, vector). */
  def filteredKnn(spark: SparkSession, indexDir: String,
                  corpus: DataFrame, vecCol: String, idCol: String,
                  query: Array[Float], k: Int,
                  values: Seq[Any]): DataFrame =
    corpus.join(ids(spark, indexDir, values)
        .withColumnRenamed("id", idCol), Seq(idCol), "left_semi")
      .withColumn("distance",
        round(VectorFunctions.l2Sq(col(vecCol), typedlit(query)), 4))
      .select(col(idCol), col("distance"))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
}
