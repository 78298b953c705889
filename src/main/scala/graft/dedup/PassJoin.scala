package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PassJoin-style segment blocking (Li, Deng & Feng, ICDE 2011) — the
  * exact edit-distance join tier for MID-LENGTH strings (URLs, titles,
  * addresses: longer than [[FuzzyJoin.MaxDeletionLen]]'s deletion-
  * neighborhood ceiling, short enough that a ≤d-edit bound is still a
  * meaningful question; content-length text belongs to the Jaccard
  * tier, see [[FuzzyJoin.MaxDeletionLen]]).
  *
  * Technique (pigeonhole on substrings instead of delete variants): cut
  * every string into `d+1` contiguous segments. An edit script of ≤ d
  * operations cannot touch all d+1 segments, so for any pair with
  * `lev(s,t) ≤ d`, t contains at least one of s's segments VERBATIM,
  * shifted by at most d positions. The index side emits d+1 segment
  * keys per row (constant — independent of string length, the whole
  * point vs O(len^d) deletion variants); the probe side emits, per
  * segment index and per candidate partner length l ∈ [len−d, len+d],
  * the substrings at the ≤ 2d+1 compatible start offsets. The block
  * join is an equi-join on (segment index, substring, partner length);
  * the exact codegen'd `levenshtein` verifies — the same
  * candidates-then-verify discipline as every dedup family member.
  *
  * Fan-out per probe row is ≤ (d+1)·(2d+1)² keys (d=1: ≤ 18; d=2: ≤ 75)
  * regardless of length. Bucket keys carry 1/(d+1) of the string —
  * long, specific substrings — so bucket sizes track true near-dup
  * cluster density, not corpus size; exact-duplicate clusters are the
  * one quadratic degenerate (identical segments everywhere), excluded
  * by composing `dedup_exact` first (the cascade discipline).
  *
  * Segment layout for length l, threshold d: k = d+1 parts; the first
  * k − (l mod k) parts have length ⌊l/k⌋, the rest ⌊l/k⌋+1 (empty
  * parts only when l < k — shorter than the threshold is the deletion
  * tier's regime anyway). Both engines derive the identical layout
  * arithmetic, so the DuckDB oracle can replay the blocking — though
  * the shipped oracle verifies the stronger contract: result equality
  * against a brute-force exact `levenshtein` join.
  */
object PassJoin {

  /** Start position (1-based) of segment `j` (0-based) of an l-length
    * string under k = d+1 parts: base = ⌊l/k⌋, the last (l mod k)
    * parts are one longer. */
  private def segStart(l: Column, j: Int, k: Int): Column = {
    val base = floor(l / k).cast("int")
    val rem = (l % k).cast("int")
    // start_j = j*base + max(0, j - (k - rem)) + 1
    (lit(j) * base + greatest(lit(0), lit(j) - (lit(k) - rem)) + 1)
      .cast("int")
  }

  private def segLen(l: Column, j: Int, k: Int): Column = {
    val base = floor(l / k).cast("int")
    val rem = (l % k).cast("int")
    (base + when(lit(j) >= lit(k) - rem, 1).otherwise(0)).cast("int")
  }

  /** Index side: one row per (id, s, seg_i, partner-length-key l =
    * own length, segment substring). */
  def segmentKeys(df: DataFrame, idCol: String, strCol: String,
                  maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val l = length(col(strCol))
    val segs = array((0 until k).map { j =>
      struct(lit(j).as("seg_i"),
        col(strCol).substr(segStart(l, j, k), segLen(l, j, k)).as("seg_s"))
    }: _*)
    df.select(col(idCol).as("b_id"), col(strCol).as("b_s"),
        l.as("l"), explode(segs).as("seg"))
      .where(length(col("seg").getField("seg_s")) > 0)
      .select(col("b_id"), col("b_s"), col("l"),
        col("seg").getField("seg_i").as("seg_i"),
        col("seg").getField("seg_s").as("seg_s"))
  }

  /** Probe side: for every partner length l ∈ [len−d, len+d] and every
    * segment index, the substrings of this row's string at start
    * offsets within ±d of the segment's home position. */
  def probeKeys(df: DataFrame, idCol: String, strCol: String,
                maxDist: Int): DataFrame = {
    val k = maxDist + 1
    val myLen = length(col(strCol))
    val probes = flatten(transform(
      sequence(myLen - maxDist, myLen + maxDist),
      l => {
        val cands = array((0 until k).flatMap { j =>
          (-maxDist to maxDist).map { delta =>
            val st = segStart(l, j, k) + delta
            val ln = segLen(l, j, k)
            struct(l.cast("int").as("l"), lit(j).as("seg_i"),
              when(st >= 1 && ln > 0 && st + ln - 1 <= myLen,
                col(strCol).substr(st, ln)).as("seg_s"))
          }
        }: _*)
        filter(cands, c => c.getField("seg_s").isNotNull)
      }))
    df.select(col(idCol).as("a_id"), col(strCol).as("a_s"),
        explode(probes).as("p"))
      .select(col("a_id"), col("a_s"),
        col("p").getField("l").as("l"),
        col("p").getField("seg_i").as("seg_i"),
        col("p").getField("seg_s").as("seg_s"))
      .where(length(col("seg_s")) > 0)
  }

  /** Exact Levenshtein self-join for mid-length strings: all pairs
    * `(a_id < b_id)` with `lev ≤ maxDist`, as `(a_id, b_id, dist)` —
    * [[FuzzyJoin.selfJoin]]'s contract from segment blocking instead
    * of deletion neighborhoods. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"passjoin radius $maxDist outside [1,3]")
    probeKeys(df, idCol, strCol, maxDist)
      .join(segmentKeys(df, idCol, strCol, maxDist),
        Seq("l", "seg_i", "seg_s"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_s", "b_s")
      .dropDuplicates("a_id", "b_id")
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")))
      .where(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"),
        col("dist").cast("int").as("dist"))
  }
}
