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
}
