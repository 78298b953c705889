package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental BM25 index — the lexical-search analogue of
  * [[IvfIndex.append]] and [[GraphAnn.append]], completing the
  * every-index-maintains-incrementally discipline (the reference's
  * keyword-enhanced search, src/app.py:297-340, rebuilds nothing
  * because Milvus owns its inverted structures; this is that
  * maintenance surface made explicit). Tokenization happens
  * ONCE per document at ingest, the artifact absorbs new batches by
  * parquet FILE APPEND (no rewrite, no re-tokenization of the existing
  * corpus), and every corpus statistic BM25 needs is derivable from the
  * artifact alone.
  *
  * Layout:
  *   - `postings/` (id, term, tf) — the inverted index rows
  *   - `doclen/`   (id, dl)      — per-doc token counts
  *
  * df(term) and (N, avgdl) are computed at query time FROM the artifact:
  * df from the postings restricted to the query terms (a pushed `term
  * IN (...)` filter — the only postings ever read), N/avgdl from the
  * doclen table (1 row per doc; the exact-long-sum ÷ count discipline of
  * [[Bm25.score]], so merged batches can never drift a floating
  * accumulator). Because BOTH statistics are pure aggregates of appended
  * rows, append-then-search equals rebuild-then-search EXACTLY — the
  * mergeable-stats property `incremental_agg_merge` pins for plain
  * aggregates, applied to a ranking index.
  *
  * Scale shape (100 TB): ingest tokenizes only the new batch; search
  * reads `terms`-matching postings (pushed filter) + the doclen
  * aggregate. At warehouse scale doclen's (N, sum dl) would fold into a
  * running 1-row stats file per append; kept derivational here so the
  * artifact has no state row to corrupt.
  */
object Bm25Index {
  def postingsDir(indexDir: String): String = s"$indexDir/postings"
  def doclenDir(indexDir: String): String = s"$indexDir/doclen"

  private def tokenize(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    // dl counts REAL terms only: split on leading whitespace yields an
    // empty first token, which postings drops — dl must drop it too or
    // the artifact's "per-doc token count" silently over-counts.
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val postings = docs
      .select(col(idCol).cast("long").as("id"), explode(toks).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val doclen = docs.select(col(idCol).cast("long").as("id"),
      size(toks).cast("long").as("dl"))
    (postings, doclen)
  }

  /** Build the artifact from scratch (overwrites). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            indexDir: String): Unit = {
    val (p, d) = tokenize(docs, idCol, textCol)
    p.write.mode("overwrite").parquet(postingsDir(indexDir))
    d.write.mode("overwrite").parquet(doclenDir(indexDir))
  }

  /** Absorb a new batch: tokenize ONLY the batch, append its rows.
    * Ids must be new (same contract as Collection.append — dedup is the
    * upsert/dedup family's job, not the index's). */
  def append(batch: DataFrame, idCol: String, textCol: String,
             indexDir: String): Unit = {
    val (p, d) = tokenize(batch, idCol, textCol)
    p.write.mode("append").parquet(postingsDir(indexDir))
    d.write.mode("append").parquet(doclenDir(indexDir))
  }

  /** BM25 top-k for `terms` from the artifact alone (see object doc).
    * Returns (id, bm25), score-desc with id tie-break. */
  def search(spark: SparkSession, indexDir: String, terms: Seq[String],
             k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val postings = spark.read.parquet(postingsDir(indexDir))
      .where(col("term").isin(terms: _*))
    val doclen = spark.read.parquet(doclenDir(indexDir))
    val stats = doclen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df_"))
    val idf = log((col("n_docs") - col("df_") + 0.5) / (col("df_") + 0.5)
      + 1.0)
    postings
      .join(dfreq, "term")
      .join(doclen, "id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        idf * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("contrib")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("id").asc)
      .limit(k)
  }
}
