package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Ingest-side content preprocessing (SURVEY §2.2 I1/I2; reference
  * `_preprocess_content`, src/app.py:190-203).
  *
  * Semantics pinned to the reference:
  *  - strip every char outside word chars, CJK (U+4E00–U+9FFF), whitespace
  *    and the listed ASCII/fullwidth punctuation (src/app.py:196);
  *  - collapse whitespace runs to single spaces and trim (src/app.py:197);
  *  - drop rows whose cleaned content is shorter than 10 chars
  *    (src/app.py:199-201 returns "" which the caller discards).
  *
  * One deliberate divergence, documented: Python's `\w` is unicode-aware
  * while Java/RE2 `\w` is ASCII; the CJK block the reference cares about
  * is covered by the explicit U+4E00–U+9FFF range, so behavior matches on
  * the reference's own data. Pure Catalyst expressions — fully codegen'd,
  * no UDFs, so a 100 TB ingest keeps the clean+filter inside the scan
  * stage.
  */
object Preprocess {
  /** Chars to KEEP: \w, CJK, whitespace, basic + fullwidth punctuation. */
  val CleanupPattern: String = "[^\\w一-鿿\\s.,!?;:，。！？；：]"
  val MinContentLength: Int = 10

  def clean(content: Column): Column =
    trim(regexp_replace(regexp_replace(content, CleanupPattern, ""), "\\s+", " "))

  /** Full I1+I2 pipeline: adds `<textCol>_clean`, drops too-short rows. */
  def apply(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(s"${textCol}_clean", clean(col(textCol)))
      .where(length(col(s"${textCol}_clean")) >= MinContentLength)
}
