package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Configurable text-analysis chain — the Milvus 2.5 `analyzer_params`
  * model (tokenizer + ordered filters) the full-text/BM25 family needs:
  * standard tokenizer (split on non-alphanumerics), then lowercase →
  * token-length band → stopword removal. The reference app delegates
  * this to Milvus's server-side analyzer; here the chain is a composed
  * codegen Column expression (split/transform/filter builtins — no UDF),
  * so it runs INSIDE the scan at index-build and at query time.
  *
  * One definition, two faces: [[tokens]] (the Column form every build/
  * ingest path applies) and [[analyze]] (the driver-side String form a
  * query string goes through) — spec-pinned identical, because an index
  * analyzed one way and a query analyzed another silently misses terms
  * (the classic analyzer-mismatch bug every Lucene deployment hits).
  */
object Analyzer {
  /** Lucene's classic 33-term English stop set (public domain list). */
  val EnglishStop: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Standard-tokenizer boundary: any run of non-alphanumerics. (ASCII
    * classes — the fixture corpus is english-ish; widen to \p{L}\p{N}
    * for multilingual corpora and mirror the oracle accordingly.) */
  val TokenizePattern: String = "[^A-Za-z0-9]+"

  final case class Config(lowercase: Boolean = true,
                          minTokenLen: Int = 2,
                          maxTokenLen: Int = 40,
                          stopwords: Seq[String] = EnglishStop)

  /** The analysis chain as a Column: array<string> of surviving tokens
    * in original order (duplicates kept — tf needs them). */
  def tokens(text: Column, cfg: Config = Config()): Column = {
    val raw = filter(split(text, TokenizePattern), t => length(t) > 0)
    val cased = if (cfg.lowercase) transform(raw, t => lower(t)) else raw
    val lenOk = filter(cased, t =>
      length(t) >= cfg.minTokenLen && length(t) <= cfg.maxTokenLen)
    if (cfg.stopwords.isEmpty) lenOk
    else filter(lenOk, t => !t.isInCollection(cfg.stopwords))
  }

  /** The SAME chain over a driver-side string (query analysis). */
  def analyze(text: String, cfg: Config = Config()): Seq[String] = {
    val stop = cfg.stopwords.toSet
    text.split(TokenizePattern).toSeq
      .filter(_.nonEmpty)
      .map(t => if (cfg.lowercase) t.toLowerCase(java.util.Locale.ROOT) else t)
      .filter(t => t.length >= cfg.minTokenLen && t.length <= cfg.maxTokenLen)
      .filterNot(stop.contains)
  }
}
