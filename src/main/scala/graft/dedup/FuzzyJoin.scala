package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) self-join via deletion-neighborhood
  * blocking — the SymSpell family (Garbe 2012; the same delete-variant
  * candidate generation underlying FastSS, Bocek et al. 2007). The
  * reference's fuzzy surface is embedding-side (Milvus L2 similarity,
  * src/app.py:240-274); string-identity near-match is the
  * complementary pipeline need (entity resolution on titles/URLs/names
  * before semantic dedup — the cleanup stage ahead of the reference's
  * content filters at src/app.py:156-178).
  *
  * Technique: two strings with `lev(s,t) <= d` necessarily share a
  * variant reachable from both by at most `d` single-character
  * deletions (each edit op — substitution, insertion, deletion — is
  * absorbed by deleting the touched position from one or both sides).
  * So: explode each string's deletion neighborhood, equi-join on the
  * variant, then VERIFY surviving candidate pairs with the exact
  * `levenshtein` function. The block join is a superset generator; the
  * verify step makes the result exact — same candidates-then-verify
  * discipline as the simhash pigeonhole join (Dedup.simhashNearPairs).
  *
  * Spark shape: all candidate generation is native codegen'd functions
  * (`transform`/`flatten`/`array_distinct`/`explode`), the block join
  * is an equi-join on the variant string (shuffle on variant, never a
  * cartesian), pair dedup is one `dropDuplicates` shuffle on the pair
  * key, and the verifier is the codegen'd `levenshtein`.
  *
  * Scale: per row the neighborhood is O(len^d) variants (19 for
  * len=18 at d=1, ~170 at d=2) — a constant fan-out, so candidate
  * volume grows linearly with corpus size for fixed near-dup density.
  * Bucket sizes are bounded by near-duplicate cluster size, NOT corpus
  * size; the one degenerate case is exact-duplicate clusters (every
  * copy shares every variant — quadratic within the cluster), which is
  * why the pipeline composes `dedup_exact` FIRST (the cascade
  * discipline, Dedup.cascade): run this join on exact-dedup keepers.
  */
object FuzzyJoin {

  /** Length ceiling for deletion-neighborhood blocking. The per-row
    * fan-out is O(len^d) variants — ~19 for an 18-char name at d=1 but
    * ~4 k for a 64-char string at d=2 and MILLIONS for content-length
    * text — so the variant explosion (not the join) becomes the cost
    * the first time someone fuzzy-joins on `content`. Above this
    * length, edit distance is also the wrong QUESTION: a ≤2-edit bound
    * on a 2 000-char document is character noise, and "nearly the same
    * content" is similarity territory — the q-gram Jaccard tier
    * ([[Dedup.jaccardTopPairs]], with its df-cap scale guard). The
    * enforcement lives in [[candidatePairs]]/[[keyTable]]/[[lookup]]
    * (loud refusal) and [[nearPairsAuto]] (the dispatch). */
  val MaxDeletionLen = 64

  /** Upper bound of the PassJoin mid-length tier ([[PassJoin]]):
    * between [[MaxDeletionLen]] and this, edit distance is still the
    * right question (URLs, titles, addresses) and segment blocking
    * answers it exactly with constant per-row fan-out; above it the
    * question itself shifts to similarity (q-gram Jaccard). */
  val MaxPassJoinLen = 256

  /** Refuse deletion-neighborhood generation on corpora with strings
    * past [[MaxDeletionLen]]: one pushed-filter limit-1 probe — cheap
    * next to the join it guards, and a loud error beats an executor
    * OOM three stages later. */
  private def requireShort(df: DataFrame, strCol: String,
                           what: String): Unit = {
    val over = df.where(length(col(strCol)) > MaxDeletionLen)
      .select(length(col(strCol)).as("len")).limit(1).collect()
    require(over.isEmpty,
      s"$what: a '$strCol' value is ${over.head.getInt(0)} chars — " +
        s"deletion-neighborhood blocking is capped at $MaxDeletionLen " +
        "(O(len^d) variant fan-out); for content-length strings use " +
        "the q-gram Jaccard tier (Dedup.jaccardTopPairs) or the " +
        "nearPairsAuto dispatch")
  }

  /** All variants of `s` reachable by deleting exactly 0 or 1
    * characters: index `i` in `0 until length` deletes the char at
    * 0-based position `i`; index `length` yields `s` itself (the empty
    * deletion falls out of the substring arithmetic). */
  private def deleteOne(s: Column): Column =
    transform(sequence(lit(0), length(s)),
      i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s))))

  /** The deletion neighborhood of `s` at radius `d`: every distinct
    * string reachable by at most `d` single-character deletions
    * (includes `s`). Fan-out is O(len^d) pre-distinct — keep `d` <= 2;
    * larger radii belong to the q-gram/jaccard tiers. */
  def deletionNeighborhood(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2, s"deletion radius $d outside [1,2]")
    val once = deleteOne(s)
    if (d == 1) array_distinct(once)
    else array_distinct(flatten(transform(once, v => deleteOne(v))))
  }

  /** The pre-verify candidate tier: distinct `(a_id < b_id)` pairs
    * sharing at least one deletion variant, with both strings carried
    * for the verifier. Exposed separately so the scaling rehearsal can
    * measure THIS volume — the verified result saturates at true-pair
    * density and would hide a quadratic candidate tier (the same
    * pre-cap measurement discipline as GraphAnn.candidatePairs). */
  def candidatePairs(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int): DataFrame = {
    requireShort(df, strCol, "fuzzy self-join")
    val keyed = df
      .select(col(idCol).as("fj_id"), col(strCol).as("fj_s"))
      .withColumn("dk",
        explode(deletionNeighborhood(col("fj_s"), maxDist)))
    val a = keyed.select(col("fj_id").as("a_id"), col("fj_s").as("a_s"),
      col("dk"))
    val b = keyed.select(col("fj_id").as("b_id"), col("fj_s").as("b_s"),
      col("dk"))
    a.join(b, Seq("dk"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_s", "b_s")
      .dropDuplicates("a_id", "b_id")
  }

  /** Exact Levenshtein self-join: all pairs `(a_id < b_id)` with
    * `lev(a, b) <= maxDist`, as `(a_id, b_id, dist)`. Equality pairs
    * (dist 0, distinct ids) are reported too — on an exact-deduped
    * input they cannot occur. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame =
    candidatePairs(df, idCol, strCol, maxDist)
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .where(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("int").as("dist"))

  /** The exploded deletion-key table of a corpus — the build-once
    * artifact form for [[lookup]] (SymSpell's actual deployment shape:
    * the dictionary's delete-variants are precomputed once; each query
    * explodes only its OWN neighborhood and equi-joins). One row per
    * (id, variant). */
  def keyTable(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    requireShort(df, strCol, "fuzzy key table")
    df.select(col(idCol).as("dict_id"), col(strCol).as("dict_s"))
      .withColumn("dk",
        explode(deletionNeighborhood(col("dict_s"), maxDist)))
  }

  /** Dictionary lookup: every `(query, dict)` pair with
    * `lev <= maxDist`, as `(q_id, dict_id, dist)` — the bulk
    * spell-correct / entity-link shape ("resolve 1M scraped names
    * against the canonical table"). `keys` is a prebuilt [[keyTable]]
    * artifact; queries explode their own neighborhoods and the block
    * join is the same lossless variant equi-join as [[selfJoin]],
    * verified by `levenshtein`. */
  def lookup(keys: DataFrame, queries: DataFrame, qidCol: String,
             qstrCol: String, maxDist: Int): DataFrame = {
    requireShort(queries, qstrCol, "fuzzy lookup")
    val q = queries
      .select(col(qidCol).as("q_id"), col(qstrCol).as("q_s"))
      .withColumn("dk",
        explode(deletionNeighborhood(col("q_s"), maxDist)))
    q.join(keys, Seq("dk"))
      .select("q_id", "dict_id", "q_s", "dict_s")
      .dropDuplicates("q_id", "dict_id")
      .withColumn("dist", levenshtein(col("q_s"), col("dict_s")))
      .where(col("dist") <= maxDist)
      .select(col("q_id"), col("dict_id"),
        col("dist").cast("int").as("dist"))
  }

  /** The length-dispatched near-pair join: ONE entry point a pipeline
    * can call on any string column. Short strings (every value ≤
    * `maxLenForDeletes`) get the deletion-neighborhood exact tier
    * ([[selfJoin]] — `score` = Levenshtein distance, `tier` = 'edit');
    * mid-length strings (≤ `maxLenForSegments`) keep EXACT edit
    * semantics via [[PassJoin.selfJoin]]'s segment blocking (`tier` =
    * 'edit_segment' — constant fan-out where deletion variants would
    * be O(len^d)); anything longer routes to the capped-df q-gram
    * Jaccard tier ([[Dedup.jaccardTopPairs]] top-`k` — `score` =
    * Jaccard, `tier` = 'jaccard'). The dispatch probe is one
    * max-length aggregate — against a stored table, parquet column
    * statistics answer it without a scan. The final semantic shift is
    * deliberate and documented: at content length, edit distance is
    * the wrong question (see [[MaxDeletionLen]]), so the dispatch
    * changes METRIC, not just plan, and labels the result with the
    * tier that produced it. */
  def nearPairsAuto(df: DataFrame, idCol: String, strCol: String,
                    maxDist: Int, k: Int,
                    maxLenForDeletes: Int = MaxDeletionLen,
                    maxLenForSegments: Int = MaxPassJoinLen,
                    workDir: Option[String] = None): DataFrame = {
    val maxLen = df.agg(max(length(col(strCol))).as("m")).collect()(0)
    val m = if (maxLen.isNullAt(0)) 0 else maxLen.getInt(0)
    if (m <= maxLenForDeletes)
      selfJoin(df, idCol, strCol, maxDist)
        .select(col("a_id"), col("b_id"),
          col("dist").cast("double").as("score"), lit("edit").as("tier"))
    else if (m <= maxLenForSegments)
      PassJoin.selfJoin(df, idCol, strCol, maxDist)
        .select(col("a_id"), col("b_id"),
          col("dist").cast("double").as("score"),
          lit("edit_segment").as("tier"))
    else
      Dedup.jaccardTopPairs(df, idCol, strCol, k, workDir = workDir)
        .select(col("id_a").as("a_id"), col("id_b").as("b_id"),
          col("jaccard").as("score"), lit("jaccard").as("tier"))
  }
}
