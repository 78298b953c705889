package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sparse-vector retrieval — Milvus SPARSE_FLOAT_VECTOR parity (the
  * index family Milvus added for SPLADE/BM25-style learned sparse
  * embeddings, a sibling of the FLOAT_VECTOR collection the reference
  * creates at src/app.py:92-103): vectors are (dimension, weight) pairs
  * with almost all weights zero, scored by dot product over the shared
  * nonzero dimensions.
  *
  * Representation: [[sparsify]] keeps the top-`topN` positive dims of a
  * dense column (the deterministic stand-in for a learned sparse
  * encoder — the engine contract is the same whatever produces the
  * pairs), weights rounded to 4 decimals BEFORE any ranking so
  * cross-engine float noise cannot reorder.
  *
  * Scale shape (100 TB): [[postings]] is the inverted index — one
  * (id, dim, w) row per nonzero. Stored partitioned/bucketed BY DIM,
  * a query touches only its own dims' partitions (partition pruning is
  * the posting-list seek, the same trick [[IvfIndex]] plays with
  * cluster_id), the tiny query side broadcasts, and the score is one
  * hash aggregate over matching postings — docs sharing no query dim
  * are never read, scored, or shuffled. No O(corpus) work, no dense
  * scan: this is the term-at-a-time inverted-index plan every lexical
  * engine runs, expressed as a join + aggregate Catalyst can fuse. */
object SparseVec {
  /** `array<struct<w,dim>>` of the top-`topN` positive dims of `vec`
    * (w rounded to 4 decimals; ties broken by lower dim; dims 1-based
    * to match SQL list indexing). */
  def sparsify(vec: Column, topN: Int): Column = {
    val pairs = filter(
      transform(vec, (x, i) =>
        struct(round(x.cast("double"), 4).as("w"),
          (i + 1).cast("int").as("dim"))),
      p => p.getField("w") > 0)
    slice(
      array_sort(pairs, (l, r) =>
        when(l.getField("w") > r.getField("w"), lit(-1))
          .when(l.getField("w") < r.getField("w"), lit(1))
          .otherwise(l.getField("dim") - r.getField("dim"))),
      1, topN)
  }

  /** The inverted-index form: one (id, dim, w) posting per kept dim. */
  def postings(df: DataFrame, idCol: String, vecCol: String,
               topN: Int): DataFrame =
    df.select(col(idCol), explode(sparsify(col(vecCol), topN)).as("p"))
      .select(col(idCol), col("p.dim").as("dim"), col("p.w").as("w"))

  /** Dot-product top-k of `corpusPostings` against a (small) query
    * posting list: join on dim, weighted sum per doc. */
  def search(corpusPostings: DataFrame, queryPostings: DataFrame,
             idCol: String, k: Int): DataFrame =
    corpusPostings
      .join(broadcast(queryPostings.select(col("dim"), col("w").as("qw"))),
        Seq("dim"))
      .groupBy(col(idCol))
      .agg(round(sum(col("w") * col("qw")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  // ---------------------------------------------------------------------
  // Stored-artifact form + maintenance twins (round 12 — the last index
  // family without a tombstone/upsert/streaming story; every verb below
  // mirrors the discipline the other five families already follow).
  // ---------------------------------------------------------------------

  def postingsDir(indexDir: String): String = s"$indexDir/postings"

  /** Materialize the inverted index under `indexDir/postings`,
    * PARTITIONED BY DIM — the posting-list layout: a query's
    * `dim IN (...)` slice is directory pruning, exactly the
    * [[IvfIndex]] cluster_id trick, so serving never lists (let alone
    * reads) a dimension no query weight touches. */
  def build(df: DataFrame, idCol: String, vecCol: String, topN: Int,
            indexDir: String): Unit =
    postings(df, idCol, vecCol, topN)
      .write.mode("overwrite").partitionBy("dim")
      .parquet(postingsDir(indexDir))

  /** Absorb a new batch by file append into the served version — ids
    * must be NEW (the [[Bm25Index.append]] contract); a posting append
    * is reader-safe in place because a reader's plan lists files once.
    * Alias-root aware, like every writer since round 12. */
  def append(batch: DataFrame, idCol: String, vecCol: String, topN: Int,
             indexDir0: String): Unit = {
    val indexDir = AliasedIndex.resolveDir(batch.sparkSession, indexDir0)
    postings(batch, idCol, vecCol, topN)
      .write.mode("append").partitionBy("dim")
      .parquet(postingsDir(indexDir))
  }

  /** Record deletes against the sparse artifact ([[Tombstones]] under
    * the index root — serve-time masked until [[compactTombstones]]
    * folds). */
  def delete(ids: DataFrame, indexDir: String, idCol: String): Unit =
    Tombstones.record(ids, indexDir, idCol)

  /** Fold recorded tombstones out of the postings (preserving the dim
    * partitioning — it IS the index structure) and clear them.
    * Alias-aware by default: on a published root the rewrite runs
    * against a copy of the current version and publishes atomically
    * ([[AliasedIndex.maintain]]); flat layouts fold in place with the
    * documented single-writer window. */
  def compactTombstones(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, idCol: String): Unit = {
    def inPlace(d: String): Unit = {
      Tombstones.compact(spark, d, postingsDir(d), Seq(idCol),
        partitionBy = Seq("dim"))
      Tombstones.clear(spark, d)
    }
    if (AliasedIndex.publishedVersions(spark, indexDir).nonEmpty)
      AliasedIndex.maintain(spark, indexDir)(inPlace)
    else inPlace(indexDir)
  }

  /** UPSERT — delete-then-insert with an immediate fold (the
    * [[graft.search.Quantize]]/SQ8 family's discipline: per-row
    * artifacts re-encode independently, no trained state, so upsert is
    * file-level surgery): tombstone the batch ids, fold postings,
    * append the re-encoded rows. After this the artifact carries
    * exactly the latest rows — no mask debt left behind. */
  def upsertBatch(spark: org.apache.spark.sql.SparkSession,
                  batch: DataFrame, idCol: String, vecCol: String,
                  topN: Int, indexDir0: String): Unit = {
    // the WHOLE delete+fold+append is ONE maintenance verb: on an
    // aliased root it runs against the v(N+1) copy and publishes
    // atomically — a reader never resolves a version whose postings
    // dir is mid-rewrite, and the new version number flips
    // [[Router.artifactFingerprint]] so cached routed/panel decisions
    // re-measure (round-13 ADVICE fix: resolving the root FIRST used
    // to drop the fold onto the flat in-place path, mutating the
    // served version under readers and under the fingerprint).
    def verb(d: String): Unit = {
      Tombstones.record(batch.select(col(idCol)), d, idCol)
      Tombstones.compact(spark, d, postingsDir(d), Seq(idCol),
        partitionBy = Seq("dim"))
      Tombstones.clear(spark, d)
      postings(batch, idCol, vecCol, topN)
        .write.mode("append").partitionBy("dim")
        .parquet(postingsDir(d))
    }
    if (AliasedIndex.publishedVersions(spark, indexDir0).nonEmpty)
      AliasedIndex.maintain(spark, indexDir0)(verb)
    else verb(indexDir0)
  }

  /** Serve top-k from the STORED artifact: the query's (≤ topN) dims
    * arrive as a literal `dim IN (...)` — directory pruning over the
    * partitioned layout (a broadcast-join DPP would be best-effort;
    * the collected dim set is the bounded query-side handoff, like the
    * query vector itself) — then the [[search]] join + aggregate,
    * tombstone-masked. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession,
                  indexDir0: String, queryPostings: DataFrame,
                  idCol: String, k: Int): DataFrame = {
    val indexDir = AliasedIndex.resolveDir(spark, indexDir0)
    val qp = queryPostings.select(col("dim"), col("w")).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq.sorted
    val scan = spark.read.parquet(postingsDir(indexDir))
      .where(col("dim").isin(qp.map(_._1): _*))
    val scored = Tombstones.mask(scan, spark, indexDir, idCol)
      .join(broadcast(spark.createDataFrame(qp).toDF("dim", "qw")),
        Seq("dim"))
      .groupBy(col(idCol))
      .agg(round(sum(col("w") * col("qw")), 4).as("score"))
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
  }
}
