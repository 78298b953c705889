package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Configurable text-analysis chain — the Milvus 2.5 `analyzer_params`
  * model (tokenizer + ordered filters) the full-text/BM25 family needs:
  * standard tokenizer (split on non-letter/non-digit, Unicode classes),
  * then an optional CJK-bigram stage, lowercase → token-length band →
  * stopword removal. The reference app delegates this to Milvus's
  * server-side analyzer; here the chain is a composed codegen Column
  * expression (split/transform/filter builtins — no UDF), so it runs
  * INSIDE the scan at index-build and at query time.
  *
  * One definition, two faces: [[tokens]] (the Column form every build/
  * ingest path applies) and [[analyze]] (the driver-side String form a
  * query string goes through) — spec-pinned identical, because an index
  * analyzed one way and a query analyzed another silently misses terms
  * (the classic analyzer-mismatch bug every Lucene deployment hits).
  *
  * CJK (round 15): the reference's OWN corpus is Chinese
  * (`milvus_data/knowledge_data.csv`; its tokenizers handle 一-龥
  * explicitly at src/app.py:334, 196-197), and Chinese text carries no
  * whitespace between words — under the Unicode boundary a whole
  * sentence tokenizes to ONE Han run. `cjkBigrams = true` adds the
  * Lucene-CJKAnalyzer stage: every pure-Han token of length ≥ 2 emits
  * its overlapping character bigrams (the standard no-dictionary CJK
  * segmentation), so a two-character query word matches any document
  * containing those adjacent characters. Mixed-script tokens and
  * single Han characters pass through unexpanded (deterministic,
  * mirrored in the oracle); set `minTokenLen = 1` for corpora where
  * single-character words matter.
  */
object Analyzer {
  /** Lucene's classic 33-term English stop set (public domain list). */
  val EnglishStop: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Standard-tokenizer boundary: any run of characters that are
    * neither letters nor digits — UNICODE categories (round 15; the
    * previous ASCII classes reduced the reference's own Chinese corpus
    * to zero tokens). Same escape syntax in Java regex (Spark) and RE2
    * (the DuckDB oracle mirror). */
  val TokenizePattern: String = "[^\\p{L}\\p{N}]+"

  /** The Han range the reference's own tokenizers use
    * (src/app.py:334 — U+4E00..U+9FA5, regex literal 一-龥). */
  val HanClass: String = "一-龥"
  private val HanLo = '一'
  private val HanHi = '龥'

  /** Single-char Latin-1/Latin-Extended foldings for the
    * `asciiFolding` stage (the 1:1 subset of Lucene's ASCIIFoldingFilter
    * — `translate()`-expressible in both Spark and the DuckDB oracle;
    * multi-char foldings like æ→ae are out of scope, documented). Both
    * cases listed so the stage is correct under `lowercase = false`
    * too. */
  private val FoldPairs: Seq[(String, Char)] = Seq(
    ("àáâãäåāă", 'a'), ("çćč", 'c'), ("èéêëēĕėęě", 'e'),
    ("ìíîïĩīĭ", 'i'), ("ñń", 'n'), ("òóôõöøōŏ", 'o'),
    ("ùúûüũūŭ", 'u'), ("ýÿ", 'y'))
  val FoldFrom: String =
    FoldPairs.map(_._1).mkString +
      FoldPairs.map(_._1.toUpperCase(java.util.Locale.ROOT)).mkString
  val FoldTo: String = {
    val lo = FoldPairs.map { case (s, c) => c.toString * s.length }.mkString
    lo + lo.toUpperCase(java.util.Locale.ROOT)
  }

  /** `stemmer` value for the minimal English plural stemmer — EXACTLY
    * Porter step 1a as three ordered regex rewrites (sses→ss, ies→i,
    * trailing s dropped unless preceded by s), NOT full Porter: every
    * rule is expressible identically in Java regex and RE2, so the
    * DuckDB oracle replays it verbatim. */
  val StemmerEnglishS = "english-s"

  final case class Config(lowercase: Boolean = true,
                          minTokenLen: Int = 2,
                          maxTokenLen: Int = 40,
                          stopwords: Seq[String] = EnglishStop,
                          cjkBigrams: Boolean = false,
                          asciiFolding: Boolean = false,
                          stemmer: Option[String] = None) {
    require(stemmer.forall(_ == StemmerEnglishS),
      s"unknown stemmer: $stemmer (supported: $StemmerEnglishS)")
  }

  /** Deterministic fingerprint of the FULL analysis chain — the
    * library-level [[TokenizePattern]] plus every Config field —
    * persisted into analyzed artifacts
    * ([[graft.search.FullText.buildAnalyzed]]) so an append or serve
    * under a DIFFERENT chain fails loudly instead of silently missing
    * terms. The round-15 ASCII→Unicode tokenizer widening is exactly
    * such a change: a pre-round-15 artifact (no marker, old pattern)
    * must be re-indexed — 'café' used to split at the accent and now
    * stays whole — and the marker turns that from a silent miss into
    * a detectable mismatch. */
  def fingerprint(cfg: Config): String =
    Seq("v2", TokenizePattern, cfg.lowercase, cfg.minTokenLen,
      cfg.maxTokenLen, cfg.stopwords.mkString(","), cfg.cjkBigrams,
      cfg.asciiFolding, cfg.stemmer.getOrElse("none")).mkString("|")

  /** The analysis chain as a Column: array<string> of surviving tokens
    * in original order (duplicates kept — tf needs them). */
  def tokens(text: Column, cfg: Config = Config()): Column = {
    val raw = filter(split(text, TokenizePattern), t => length(t) > 0)
    // CJK-bigram stage BEFORE the case/length/stop filters, so bigrams
    // are what the band and stop list see — identical order to analyze
    val granular =
      if (!cfg.cjkBigrams) raw
      else flatten(transform(raw, t =>
        when(t.rlike(s"^[$HanClass]{2,}$$"),
          transform(sequence(lit(1), length(t) - 1),
            i => t.substr(i, lit(2))))
          .otherwise(array(t))))
    val cased =
      if (cfg.lowercase) transform(granular, t => lower(t)) else granular
    // fold THEN stem (Milvus 2.5 analyzer_params filter order as
    // configured here; documented chain: case → asciifolding →
    // stemmer → length band → stopwords — the band and stop list see
    // the folded/stemmed surface, identical in analyze)
    val folded =
      if (!cfg.asciiFolding) cased
      else transform(cased, t => translate(t, FoldFrom, FoldTo))
    val stemmed =
      if (cfg.stemmer.isEmpty) folded
      else transform(folded, t => stemS(t))
    val lenOk = filter(stemmed, t =>
      length(t) >= cfg.minTokenLen && length(t) <= cfg.maxTokenLen)
    if (cfg.stopwords.isEmpty) lenOk
    else filter(lenOk, t => !t.isInCollection(cfg.stopwords))
  }

  /** Porter step 1a as a codegen Column chain — the three ordered
    * rewrites compose correctly sequentially (sses→ss leaves an
    * ss-tail the later rules skip; ies→i leaves no s-tail; the final
    * rule's `([^s])s$` guard is the RE2-safe spelling of "unless
    * preceded by s" — RE2 has no lookbehind, so the DuckDB mirror
    * uses this exact pattern too). */
  private def stemS(t: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(t, "sses$", "ss"), "ies$", "i"),
      "([^s])s$", "$1")

  private def isHanRun(t: String): Boolean =
    t.length >= 2 && t.forall(c => c >= HanLo && c <= HanHi)

  /** The SAME chain over a driver-side string (query analysis). */
  def analyze(text: String, cfg: Config = Config()): Seq[String] = {
    val stop = cfg.stopwords.toSet
    val raw = text.split(TokenizePattern).toSeq.filter(_.nonEmpty)
    val granular =
      if (!cfg.cjkBigrams) raw
      else raw.flatMap { t =>
        if (isHanRun(t))
          (0 until t.length - 1).map(i => t.substring(i, i + 2))
        else Seq(t)
      }
    granular
      .map(t => if (cfg.lowercase) t.toLowerCase(java.util.Locale.ROOT) else t)
      .map(t => if (cfg.asciiFolding) foldAscii(t) else t)
      .map(t => if (cfg.stemmer.isDefined) stemS(t) else t)
      .filter(t => t.length >= cfg.minTokenLen && t.length <= cfg.maxTokenLen)
      .filterNot(stop.contains)
  }

  private lazy val foldMap: Map[Char, Char] =
    FoldFrom.zip(FoldTo).toMap

  private def foldAscii(t: String): String =
    t.map(c => foldMap.getOrElse(c, c))

  private def stemS(t: String): String =
    t.replaceAll("sses$", "ss").replaceAll("ies$", "i")
      .replaceAll("([^s])s$", "$1")
}
