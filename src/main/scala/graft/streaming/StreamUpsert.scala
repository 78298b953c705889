package graft.streaming

import graft.core.Collection
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC ingest: MERGE each micro-batch into a [[Collection]] via
  * `foreachBatch` — the standard Structured-Streaming pattern for a sink
  * that needs upsert (not append) semantics: a re-delivered or updated
  * record replaces its stored row instead of landing twice.
  *
  * Contract notes:
  *  - `foreachBatch` gives at-least-once delivery; the MERGE makes the
  *    sink idempotent per key, so replays converge instead of
  *    duplicating — exactly why CDC sinks pair foreachBatch with MERGE.
  *  - A micro-batch may contain several versions of one key;
  *    [[Collection.upsert]] refuses duplicate-key batches, so the batch
  *    is first reduced to its LAST version per key (max by `versionCol`,
  *    ties by the row's key order) — the same "latest wins" reduction
  *    Delta's CDC apply does.
  *  - State is all in the sink; the stream itself is stateless, so this
  *    scales as: per-trigger shuffle of the batch by key + the MERGE
  *    rewrite.
  */
object StreamUpsert {
  /** Start a stream that upserts every micro-batch into `coll`. */
  def start(src: DataFrame, coll: Collection, keyCol: String,
            versionCol: String, queryName: String): StreamingQuery =
    src.writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        coll.upsert(latestPerKey(batch, keyCol, versionCol), keyCol)
      }
      .start()

  /** Reduce a batch to its latest version per key. Deterministic only
    * when `versionCol` is unique per key within a batch (give versions a
    * total order — a sequence number or exact timestamp); on version
    * ties the kept row is arbitrary. */
  def latestPerKey(batch: DataFrame, keyCol: String,
                   versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc)
    batch.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
