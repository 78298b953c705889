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
  *  - `foreachBatch` gives at-least-once delivery; the merge is
  *    version-aware ([[Collection.upsertVersioned]]): an update wins only
  *    with a strictly higher version, so a replayed OLDER record —
  *    whether inside one batch or batches apart — can never regress a
  *    newer stored row. That is what makes replays converge.
  *  - For durable progress across restarts pass `checkpointDir`;
  *    without it the query uses a temporary checkpoint and a restart
  *    reprocesses from scratch (safe — the versioned merge is
  *    idempotent — just wasteful).
  *  - `trigger` defaults to AvailableNow (drain-and-stop backfill);
  *    pass a processing-time trigger for an always-on stream.
  *  - State is all in the sink; the stream itself is stateless, so this
  *    scales as: per-trigger key-partitioned window over
  *    collection ∪ batch + the MERGE rewrite.
  */
object StreamUpsert {
  /** Start a stream that version-merges every micro-batch into `coll`. */
  def start(src: DataFrame, coll: Collection, keyCol: String,
            versionCol: String, queryName: String,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = src.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        coll.upsertVersioned(batch, keyCol, versionCol)
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }
}
