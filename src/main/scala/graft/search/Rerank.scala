package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Cross-encoder rerank seam — the final stage of a production retrieval
  * stack (the reference's own use case is RAG, src/app.py:370: retrieve →
  * fuse → answer; deployments insert a pair-scoring cross-encoder between
  * fuse and answer). A cross-encoder reads the (query, document) PAIR
  * jointly, so unlike the bi-encoder [[graft.ingest.Embedder]] its scores
  * cannot be precomputed per document — it must run over the fused top-N
  * at query time, batched per executor.
  *
  * [[PairScorer]] is the pluggable seam (an ONNX/JNI cross-encoder at
  * scale — the [[graft.ingest.Embedder]] discipline applied to a
  * pair-scorer, same batched `mapPartitions` shape, no driver
  * round-trips); [[TokenJaccardScorer]] is the deterministic,
  * dependency-free default that keeps the composed operator oracle-able
  * (the DuckDB oracle replays token-set Jaccard exactly).
  *
  * Scale shape: the scorer only ever sees the fused top-N (tens of rows
  * per query), so the expensive model runs on a plan-constant row count;
  * the corpus-scale work stays in the first-stage retrievers. */
trait PairScorer extends Serializable {
  /** Score one batch of (query, doc) pairs. Deterministic for a given
    * input; higher = more relevant. */
  def score(pairs: Seq[(String, String)]): Seq[Double]
}

/** Token-SET Jaccard overlap — lowercase (Locale.ROOT, the
  * [[graft.ingest.HashingEmbedder]] stability discipline), whitespace
  * tokens, |q ∩ d| / |q ∪ d|; both empty ⇒ 0. Batch-shape-independent
  * by construction (each pair scored alone), which RerankSpec pins. */
final class TokenJaccardScorer extends PairScorer {
  private def toks(s: String): Set[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty).toSet
  override def score(pairs: Seq[(String, String)]): Seq[Double] =
    pairs.map { case (q, d) =>
      val (a, b) = (toks(q), toks(d))
      val union = a.union(b).size
      if (union == 0) 0.0 else a.intersect(b).size.toDouble / union
    }
}

object Rerank {
  /** Append `outCol` = round(scorer(queryText, textCol), 4), scored in
    * `batchSize` batches per partition — per-executor batching, no
    * driver round-trips, linear in partitions (the Embedder seam shape,
    * ingest/Embedder.scala discipline). Rounded so the ranking is
    * stable across engines at the correctness gate's granularity. */
  def withPairScores(df: DataFrame, queryText: String, textCol: String,
                     outCol: String, scorer: PairScorer,
                     batchSize: Int = 100): DataFrame = {
    val schema = df.schema.add(outCol, DoubleType)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.score(batch.map(r =>
          (queryText, Option(r.getString(textIdx)).getOrElse(""))))
        batch.iterator.zip(scores.iterator).map { case (r, sc) =>
          Row.fromSeq(r.toSeq :+ BigDecimal(sc)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }(Encoders.row(schema))
  }

  /** The composed operator: join the fused candidate rows (id + fusion
    * score) to their text, pair-score against `queryText`, re-rank by
    * (score desc, fusion desc, id asc), truncate to k. The join is a
    * broadcast of the BOUNDED fused side against the docs table — at
    * scale this is a pushed `id IN` point fetch of N documents. */
  def crossEncoderRerank(fused: DataFrame, docs: DataFrame, idCol: String,
                         textCol: String, fusionCol: String,
                         queryText: String, scorer: PairScorer,
                         k: Int, batchSize: Int = 100): DataFrame = {
    val withText = broadcast(fused)
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
    withPairScores(withText, queryText, textCol, "ce_score", scorer,
        batchSize)
      .drop(textCol)
      .orderBy(col("ce_score").desc, col(fusionCol).desc,
        col(idCol).asc)
      .limit(k)
  }
}
