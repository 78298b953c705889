package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-unigram language-model scoring — the classic cheap perplexity
  * proxy for training-data quality (CCNet/RedPajama score documents with
  * a small LM and drop the tail; with no model weights available offline,
  * the corpus's own unigram distribution is the self-contained variant).
  *
  * score(doc) = mean over tokens of ln P(token), with
  * P(token) = corpus_count(token) / corpus_total. Gibberish and
  * rare-token-heavy documents score far below the corpus mode, fluent
  * repetition scores high — rank by `avg_logprob` and cut the tails.
  *
  * Scale shape: one token hash-aggregate (map-side partials) builds the
  * vocabulary; scoring is a token-keyed shuffle join back to the token
  * stream, then a doc-keyed aggregate. The corpus total joins in as a
  * broadcast of ONE row. The token join is Zipf-skewed (the head token
  * carries ~5-10% of rows) — AQE skew-join splits those partitions at
  * runtime; for extreme corpora, broadcast the head-K vocabulary rows and
  * shuffle-join only the tail (same two-tier shape as SaltedJoin).
  */
object LangModel {
  /** Per-doc avg unigram log-probability + token count.
    * Output: id, avg_logprob (4 dp), n_tokens. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n_total"))
    tok.join(vocab, "token")
      .crossJoin(broadcast(total))
      .select(col("id"), (log(col("cnt")) - log(col("n_total"))).as("lp"))
      .groupBy(col("id"))
      .agg(round(avg(col("lp")), 4).as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
      .withColumnRenamed("id", idCol)
  }
}
