package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication: emit only the FIRST arrival per key —
  * the ingest-time guard an always-on training-data pipeline runs so a
  * re-crawled or re-delivered document never lands twice.
  *
  * State contract at scale: with an event-time column, the key state is
  * dropped once the watermark passes (`dropDuplicatesWithinWatermark`) —
  * bounded by keys per horizon, the only shape that survives an
  * unbounded stream. Without one (bounded backfill), plain
  * `dropDuplicates` keeps one entry per distinct key for the run.
  * Dedup keys should be fingerprints (e.g. `md5(text)`), not full
  * payloads, so the state store holds digests, not documents.
  */
object StreamDedup {
  def firstPerKey(src: DataFrame, keyCols: Seq[String],
                  eventTimeCol: Option[String] = None,
                  watermark: String = "2 hours"): DataFrame =
    eventTimeCol match {
      case Some(tsCol) if src.isStreaming =>
        src.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
      case _ =>
        src.dropDuplicates(keyCols)
    }
}
