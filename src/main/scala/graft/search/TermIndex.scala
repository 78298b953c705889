package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prefix term match over a SORTED-term postings layout — the lexical
  * tier's missing match mode (the reference's engine grew a text-match
  * family — term, phrase, AND prefix — next to BM25; Lucene serves
  * prefix as a term-dictionary range scan). The artifact is the
  * [[Bm25Index]] postings (id, term, tf) RE-LAID-OUT range-partitioned
  * and sorted by term, so `term LIKE 'abc%'` reaches the parquet scan
  * as a pushed `StringStartsWith` and resolves by row-group min/max
  * stats pruning — the `sorted_scan_prune` discipline applied to a
  * lexical artifact. PlanSpec pins the pushed filter.
  *
  * Scale shape (100 TB): a prefix query reads only the files/row-groups
  * whose [min, max] term range intersects the prefix interval — the
  * sorted layout makes that a contiguous sliver of the artifact; the
  * per-doc aggregation shuffles only the matching postings. The layout
  * is rebuilt per postings epoch (sorting is what it sells — a file
  * append would interleave ranges and void the pruning), which is the
  * standard segment-merge contract for sorted lexical structures.
  */
object TermIndex {
  def sortedPostingsDir(indexDir: String): String =
    s"$indexDir/postings_sorted"

  /** Build the sorted-term layout: the [[Bm25Index]] tokenization,
    * range-partitioned by term into `nFiles` files and sorted within
    * each — every file covers one contiguous term range, so parquet
    * footer stats prune non-intersecting files at scan time. */
  def buildSorted(docs: DataFrame, idCol: String, textCol: String,
                  indexDir: String, nFiles: Int = 8): Unit = {
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs.select(col(idCol).cast("long").as("id"), explode(toks).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .repartitionByRange(nFiles, col("term"))
      .sortWithinPartitions(col("term"), col("id"))
      .write.mode("overwrite").parquet(sortedPostingsDir(indexDir))
  }

  /** The postings slice for `term LIKE '<prefix>%'` — the pushed
    * StringStartsWith range scan (shared by the id-set and ranked
    * forms). */
  def prefixPostings(spark: SparkSession, indexDir: String,
                     prefix: String): DataFrame = {
    require(prefix.nonEmpty, "prefixPostings: empty prefix matches all")
    spark.read.parquet(sortedPostingsDir(indexDir))
      .where(col("term").startsWith(prefix))
  }

  /** Distinct ids of documents containing ANY term with `prefix` — the
    * filter form, composing with BM25 exactly like
    * [[Phrase.matchingIds]] (a prefix clause under a scoring query).
    * Tombstone-masked. */
  def prefixIds(spark: SparkSession, indexDir: String,
                prefix: String): DataFrame =
    Tombstones.mask(
      prefixPostings(spark, indexDir, prefix).select(col("id")).distinct(),
      spark, indexDir, "id")

  /** Prefix-match top-k: docs ranked by TOTAL occurrences of
    * prefix-matching terms (Σ tf over the matched slice), id
    * tie-break — the term-match ranking unit (`nhits`), same as the
    * phrase tier. Tombstone-masked. Returns (id, nhits). */
  def prefixSearch(spark: SparkSession, indexDir: String, prefix: String,
                   k: Int): DataFrame = {
    val scored = prefixPostings(spark, indexDir, prefix)
      .groupBy(col("id"))
      .agg(sum(col("tf")).cast("long").as("nhits"))
    Tombstones.mask(scored, spark, indexDir, "id")
      .orderBy(col("nhits").desc, col("id").asc)
      .limit(k)
  }
}
