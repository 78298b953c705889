package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: redact URLs, email
  * addresses, and phone-shaped numbers before text ever reaches a
  * training shard.
  *
  * Redaction is sequential (URL → email → phone) so an email inside a URL
  * query string is consumed by the URL pass and never double-counted; the
  * per-type counts are taken on each pass's *input*, i.e. they count what
  * that pass actually redacted.
  *
  * The regexes deliberately use only syntax with identical semantics in
  * Java regex (Spark codegen'd `regexp_replace`/`regexp_extract_all`) and
  * RE2 (the DuckDB oracle): character classes, bounded repetition, and
  * ASCII word boundaries.
  *
  * Scale shape: pure per-row map work — no shuffle, no state. At 100 TB
  * this pipelines with the scan.
  */
object Pii {
  val UrlRe: String = "https?://[^\\s]+"
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Adds n_urls, n_emails, n_phones and `<textCol>_redacted`. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, UrlRe, "<URL>")
    val t2 = regexp_replace(t1, EmailRe, "<EMAIL>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    df.withColumn("n_urls",
        size(regexp_extract_all(t0, lit(UrlRe), lit(0))).cast("long"))
      .withColumn("n_emails",
        size(regexp_extract_all(t1, lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(t2, lit(PhoneRe), lit(0))).cast("long"))
      .withColumn(s"${textCol}_redacted", t3)
  }
}
