package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed BPE merge learning (Sennrich et al. 2016) — the tokenizer-
  * fitting step of a training-data pipeline, run as N rounds of
  * count-pairs → pick-argmax → merge:
  *
  *   1. every corpus word becomes a space-delimited character sequence
  *      (`" h e l l o "`);
  *   2. each round counts adjacent symbol pairs across the corpus — one
  *      map-side-combined hash aggregate, the only shuffle in the loop —
  *      and picks the most frequent pair not yet merged (ties broken
  *      lexicographically, so the learned merge table is deterministic);
  *   3. the winning pair is merged corpus-wide by delimiter-string
  *      replacement, applied twice because adjacent occurrences share a
  *      delimiter space (`" x y x y "`: the first leftmost-nonoverlap
  *      pass consumes the shared space and skips the next occurrence).
  *      Two-pass replace IS the pinned semantics (it differs from
  *      canonical greedy BPE only on runs like `x x x x`, where which
  *      occurrences merge is a convention choice either way), and
  *      `replace` is leftmost-nonoverlapping in both engines, which is
  *      what lets the DuckDB oracle replay the loop exactly.
  *
  * Scale shape: the driver holds only the merge table (N rows, one
  * 1-row collect per round); pair counting and merging stay distributed.
  * Each round re-derives the sequence column through the growing replace
  * lineage — at warehouse scale you would checkpoint every few rounds
  * (or fit on a hash-sample of the corpus, as production BPE trainers
  * do); for a bounded merge count the lineage is fine and keeps the
  * operator side-effect-free.
  */
object BpeLearn {
  /** Words → delimited char sequences (keeps multiplicity: a word seen
    * 100× weighs 100× in the pair counts, as in reference BPE). */
  def wordSeqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .select(concat(lit(" "),
        array_join(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))), " "),
        lit(" ")).as("seq"))

  /** Adjacent-pair multiset via the codegen'd shingle kernel (the HOF
    * split/transform/element_at chain profiled ~5× slower per round). */
  private def pairsOf(seq: Column): Column =
    graft.functions.TextFunctions.tokenShinglesAll(trim(seq), 2)

  /** Learn `nMerges` merges. Output: (merge_rank, pair, merged, n) —
    * n is the corpus pair count at selection time. */
  def learn(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    // Each round's sequences are cached so round k scans round k-1's
    // in-memory state instead of re-deriving the whole replace lineage
    // from the raw corpus (which made the loop O(rounds²) scans). The
    // caches back a driver-side result only, so they are all dropped
    // before returning — nothing leaks into later queries' timings. At
    // cluster scale this is the same decision as checkpointing the
    // iteration state of any fixed-point loop (cf. Dedup.clusters).
    var prev: Option[DataFrame] = None
    var cur = wordSeqs(df, textCol)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      var r = 1
      while (r <= nMerges) {
        cur.cache()
        val counts = cur.select(explode(pairsOf(col("seq"))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        val excluded = merges.map(_._2).toSeq
        val top = (if (excluded.isEmpty) counts
                   else counts.where(!col("pair").isin(excluded: _*)))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(1).collect()
        require(top.nonEmpty,
          s"bpe: corpus exhausted after ${merges.size} merges, wanted $nMerges")
        val pair = top.head.getString(0)
        val merged = pair.replace(" ", "")
        merges += ((r.toLong, pair, merged, top.head.getLong(1)))
        // the collect above materialized cur's cache; the previous
        // round's cache is never read again — release it now so peak
        // storage stays 2× corpus, not rounds× (standard iterative-
        // algorithm cache rotation)
        prev.foreach(_.unpersist(blocking = false))
        prev = Some(cur)
        def rep(c: Column): Column =
          call_function("replace", c, lit(s" $pair "), lit(s" $merged "))
        cur = cur.select(rep(rep(col("seq"))).as("seq"))
        r += 1
      }
    } finally {
      prev.foreach(_.unpersist(blocking = false))
      cur.unpersist(blocking = false)
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "pair", "merged", "n")
      .orderBy(col("merge_rank").asc)
  }

  /** Batched merge learning — the vocab-axis scale path: the
    * single-merge loop above costs one corpus scan per merge, so a 32k
    * vocab means 32k jobs. This variant (the public batched-BPE
    * technique production trainers use) selects up to `batch`
    * SYMBOL-DISJOINT merges per scan and applies them together —
    * disjointness makes the batch order-independent, so the result
    * equals the sequential learner whenever the top pairs don't
    * interact (TextSpec pins that equivalence on a conflict-free
    * corpus, AND on a conflicting one where the rule defers the
    * blocked pair to the next scan). Scans per vocab drop ~batch×.
    *
    * Selection rule (deterministic, engine-portable, non-recursive —
    * the DuckDB oracle replays it verbatim): rank candidate pairs by
    * (count DESC, pair ASC); within the top 4·batch candidates keep a
    * pair iff NEITHER of its symbols appears in ANY higher-ranked
    * candidate — kept or not (independence against predecessors is one
    * anti-join; greedy-vs-kept-only would be inherently sequential);
    * take the first `batch` kept, in rank order. The rank-1 candidate
    * is always kept, so every scan makes progress. */
  def learnBatched(df: DataFrame, textCol: String, nMerges: Int,
                   batch: Int): DataFrame =
    learnBatchedCore(df, textCol, batch,
      maxMerges = nMerges, maxScans = Int.MaxValue)

  /** Fixed-SCAN-budget batched learning: exactly `nScans` corpus scans,
    * up to `batch` merges each — possibly fewer when conflicts defer
    * pairs, so the total is data-dependent but the scan count (and with
    * it the SQL replay shape) is not. This is the oracle-pinned form:
    * a statically-unrollable number of scans is what lets DuckDB replay
    * every scan's rank → anti-join → take → apply chain as CTEs. */
  def learnBatchedScans(df: DataFrame, textCol: String, nScans: Int,
                        batch: Int): DataFrame =
    learnBatchedCore(df, textCol, batch,
      maxMerges = nScans * batch, maxScans = nScans)

  private def learnBatchedCore(df: DataFrame, textCol: String, batch: Int,
                               maxMerges: Int, maxScans: Int): DataFrame = {
    val spark = df.sparkSession
    var prev: Option[DataFrame] = None
    var cur = wordSeqs(df, textCol)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      var scans = 0
      while (merges.size < maxMerges && scans < maxScans) {
        cur.cache()
        val counts = cur.select(explode(pairsOf(col("seq"))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        val excluded = merges.map(_._2).toSeq
        val top = (if (excluded.isEmpty) counts
                   else counts.where(!col("pair").isin(excluded: _*)))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(4 * batch).collect()
          .map(r => (r.getString(0), r.getLong(1)))
        require(top.nonEmpty,
          s"bpe: corpus exhausted after ${merges.size} merges")
        val cap = math.min(batch, maxMerges - merges.size)
        val seen = scala.collection.mutable.Set.empty[String]
        val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        for ((pair, n) <- top) {
          val syms = pair.split(" ")
          if (kept.size < cap && syms.forall(!seen.contains(_)))
            kept += ((pair, n))
          seen ++= syms
        }
        prev.foreach(_.unpersist(blocking = false))
        prev = Some(cur)
        val newSeq = kept.foldLeft(col("seq")) { case (c, (pair, _)) =>
          val merged = pair.replace(" ", "")
          def rep(x: Column): Column =
            call_function("replace", x, lit(s" $pair "), lit(s" $merged "))
          rep(rep(c))
        }
        cur = cur.select(newSeq.as("seq"))
        kept.foreach { case (pair, n) =>
          merges += ((merges.size + 1L, pair, pair.replace(" ", ""), n))
        }
        scans += 1
      }
    } finally {
      prev.foreach(_.unpersist(blocking = false))
      cur.unpersist(blocking = false)
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "pair", "merged", "n")
      .orderBy(col("merge_rank").asc)
  }

  /** Apply a learned merge table — the ENCODE half of the tokenizer:
    * every word becomes its delimited char sequence and each merge is
    * applied in rank order via the SAME two-pass leftmost-nonoverlapping
    * delimiter replace the learner used, so learn → encode round-trips
    * one deterministic tokenizer (the engine-portable property that lets
    * the oracle replay both halves). The merge table is tokenizer STATE:
    * N driver-held rows folded into the column expression, so encoding
    * is pure per-row map work — 2N codegen `replace` calls per word, no
    * shuffle until the per-document aggregate. Returns one row per
    * document with ≥ 1 word: `(idCol, n_words, n_bpe_tokens)` — the
    * post-merge token count a pipeline budgets sequences with. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol),
        explode(TextAnalysis.wsTokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
    val seq0: Column = concat(lit(" "),
      array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), " "), lit(" "))
    val encoded = merges.foldLeft(seq0) { case (c, (pair, merged)) =>
      def rep(x: Column): Column =
        call_function("replace", x, lit(s" $pair "), lit(s" $merged "))
      rep(rep(c))
    }
    words
      .select(col(idCol),
        size(split(trim(encoded), " ")).cast("long").as("__nt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__nt")).as("n_bpe_tokens"))
  }
}
