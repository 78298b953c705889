package graft

import graft.QueryDsl._
import graft.core.Tables
import graft.curate.Sampling
import org.apache.spark.sql.functions._

/** Dataset-curation coverage: deterministic (hash-based) splits and
  * subsampling over `documents` — reproducible across engines, reruns,
  * and corpus growth, unlike `rand()`-seeded sampling. */
object CurateQueries {
  /** First 16 md5 bits of the id's decimal string (Horner over 4 hex
    * nibbles), mod 100 — DuckDB mirror of Sampling.hashBucket. */
  private def nib(i: Int) =
    s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
  private val duckBucket =
    s"((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % 100)"

  /** Deterministic 80/10/10 train/val/test assignment per document. */
  private val trainValTestSplit = Q(
    "train_val_test_split",
    (s, dir) =>
      Sampling.withSplit(Tables.documents(s, dir), "doc_id")
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id").asc),
    Some(s"""
      SELECT doc_id,
             CASE WHEN $duckBucket < 80 THEN 'train'
                  WHEN $duckBucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents ORDER BY doc_id ASC
    """))

  /** Deterministic 10% corpus subsample (hash bucket < 10). */
  private val sampleHash = Q(
    "sample_hash_10pct",
    (s, dir) =>
      Sampling.sampleByHash(Tables.documents(s, dir), "doc_id", pct = 10)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id").asc),
    Some(s"""
      SELECT doc_id, n_chars FROM documents
      WHERE $duckBucket < 10
      ORDER BY doc_id ASC
    """))

  val all: Seq[Q] = Seq(trainValTestSplit, sampleHash)
}
