package graft.search

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Binary-vector representation and hamming ranking — Milvus
  * BINARY_VECTOR + HAMMING metric parity (the reference's Milvus client
  * exposes binary collections alongside the FLOAT_VECTOR one it creates
  * at src/app.py:92-103).
  *
  * Float vectors binarize to their sign bits (the zero-threshold case of
  * the SRP hyperplane signs in [[graft.dedup.Dedup]]), packed 32 bits
  * per Long word via the same big-endian Horner fold as the packed
  * simhash carrier — a 32-slot fold cannot overflow a signed Long, and
  * per-word equality ⇔ slotwise equality. Hamming distance is then one
  * codegen `bit_count(XOR)` per word.
  *
  * Why it matters at 100 TB: 64 dims of float32 (256 bytes) become two
  * Longs (16 bytes); a hamming scan reads 16× fewer bytes and does 2
  * XOR+popcounts instead of 64 multiply-adds per row, and the top-k is
  * still TakeOrderedAndProject — no shuffle, no index build. */
object BinaryVec {
  /** Word `wi` (32 sign bits) of `vec`'s binary signature. Slots past
    * the vector's length contribute 0 (absent ⇒ bit 0): a partial final
    * word is left-shifted into the HIGH bits by the finish lambda, so a
    * dim-40 vector and a dim-64 vector with identical first 40 signs get
    * identical word 1 except in genuinely-present slots — per-word
    * alignment holds for mixed dims, as the hamming contract requires. */
  def signWord(vec: Column, wi: Int): Column = {
    val s = slice(vec, wi * 32 + 1, 32)
    aggregate(s, lit(0L),
      (acc, v) => acc * 2 + when(v >= 0, 1L).otherwise(0L),
      acc => call_function("shiftleft", acc, lit(32) - size(s)).cast("long"))
  }

  /** Hamming distance between two packed signatures of `nWords` words
    * (column-name pairs, e.g. `("w0","qw0") :: ("w1","qw1")`). */
  def hamming(pairs: Seq[(Column, Column)]): Column =
    pairs.map { case (a, b) =>
      call_function("bit_count", a.bitwiseXOR(b)).cast("long")
    }.reduce(_ + _)

  /** The packed-signature table the asymmetric tier stores and every
    * producer (search entries, audit, scale rehearsal, streaming
    * ingest) must build IDENTICALLY: rotate by `rotation`, pack sign
    * words w0..w(dim/32−1), attach the correction float. One
    * definition — a layout change here reaches all producers of the
    * shared artifact at once. */
  def packTable(df: org.apache.spark.sql.DataFrame, idCol: String,
                vecCol: String, rotation: Seq[(Int, Array[Float])],
                dim: Int): org.apache.spark.sql.DataFrame = {
    require(dim % 32 == 0, s"dim $dim must pack into whole 32-bit words")
    val words = (0 until dim / 32).map(wi =>
      signWord(col("__rvec"), wi).as(s"w$wi"))
    df.select(col(idCol),
        Rotation.projectCol(col(vecCol), rotation).as("__rvec"))
      .select((col(idCol) +: words :+
        signCorrection(col("__rvec"), dim).as("cx")): _*)
  }

  /** Per-vector 1-bit correction factor c_x = ⟨sign(x), x⟩ / (√D·‖x‖)
    * = ‖x‖₁ / (√D·‖x‖₂) — the ⟨ō, x̄⟩ term of RaBitQ's estimator (Gao &
    * Long, SIGMOD 2024): how well the sign vector represents its float
    * vector. Stored ROUNDED (4 decimals) next to the packed words, one
    * float per row. Double accumulation in slot order on both engines. */
  def signCorrection(vec: Column, dim: Int): Column = {
    val l1 = aggregate(vec, lit(0.0),
      (acc, v) => acc + abs(v.cast("double")))
    val l2 = sqrt(aggregate(vec, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    round(when(l2 === 0, 0.0)
      .otherwise(l1 / (lit(math.sqrt(dim.toDouble)) * l2)), 4)
      .cast("float")
  }

  /** Asymmetric 1-bit cosine estimator from PACKED sign words — the
    * float query is NOT binarized (Jégou et al. 2011's asymmetric-
    * distance principle applied to the 1-bit code; RaBitQ's estimator
    * shape): est = (⟨sign(x), q̂⟩/√D) / c_x with q̂ the unit query,
    * computed as (2·S₁ − Σq̂)/(√D·c_x) where S₁ = Σ_{j: bit j set} q̂_j.
    * `qhat` values arrive as plan literals (driver-normalized, bounded
    * 1-query state); the per-row work is D conditional adds over the
    * packed words — a scan of ~20-byte rows, no float vector read. */
  def asymCosScore(words: Seq[Column], qhat: Array[Double],
                   cx: Column): Column =
    asymCosFromS1(words, qhat, cx,
      graft.functions.VectorFunctions.asymSignDot(
        array(words: _*), qhat.toIndexedSeq))

  /** The original per-dimension CASE-chain S₁ (one codegen term per dim
    * — tight at dim 64, past JIT/codegen limits at dim ≥ 1024). Kept as
    * the reference formulation the kernel path is property-pinned
    * against (SearchOpsSpec): the [[graft.functions.AsymSignDot]] loop
    * accumulates in the same ascending-j order, so the two are equal to
    * the last bit, not merely to tolerance. */
  private[graft] def asymCosScoreUnrolled(words: Seq[Column],
                                          qhat: Array[Double],
                                          cx: Column): Column = {
    val dim = qhat.length
    val s1 = (0 until dim).map { j =>
      val w = words(j / 32)
      val bit = shiftright(w, 31 - (j % 32)).bitwiseAND(lit(1L))
      when(bit === 1L, lit(qhat(j))).otherwise(lit(0.0))
    }.reduce(_ + _)
    asymCosFromS1(words, qhat, cx, s1)
  }

  private def asymCosFromS1(words: Seq[Column], qhat: Array[Double],
                            cx: Column, s1: Column): Column = {
    val dim = qhat.length
    require(words.size * 32 == dim,
      s"need ${dim / 32} packed words for dim $dim, got ${words.size}")
    val stot = lit(qhat.sum)
    round(when(cx === 0f, 0.0)
      .otherwise((s1 * 2.0 - stot)
        / (lit(math.sqrt(dim.toDouble)) * cx.cast("double"))), 4)
  }

  /** Σ popcount(a ∧ b) over packed word pairs — the intersection count
    * all three overlap metrics ([[jaccardDist]], [[substructureDist]],
    * [[superstructureDist]]) share; ONE definition so a packing change
    * reaches every metric at once. */
  private def interCount(pairs: Seq[(Column, Column)]): Column =
    pairs.map { case (a, b) =>
      call_function("bit_count", a.bitwiseAND(b)).cast("long")
    }.reduce(_ + _)

  /** 1 − inter/denom with the 0/0 → 0 convention, rounded 4 decimals. */
  private def containmentDist(pairs: Seq[(Column, Column)],
                              denom: Column): Column =
    round(when(denom === 0, 0.0)
      .otherwise(lit(1.0)
        - interCount(pairs).cast("double") / denom.cast("double")), 4)

  /** SUBSTRUCTURE distance between packed signatures — the third binary
    * metric Milvus serves (SUBSTRUCTURE, the chemical-fingerprint "is
    * the query molecule contained in the candidate" test):
    * 1 − |a ∧ b| / |b| with `b` the QUERY — exactly 0 iff every query
    * bit is set in the stored candidate (query ⊆ candidate). Same
    * packed-word scan shape as [[jaccardDist]] (two popcounts per
    * word); an all-zero query matches everything (distance 0), the 0/0
    * convention Milvus's formula implies. Rounded to 4 decimals for
    * cross-engine rank stability. */
  def substructureDist(pairs: Seq[(Column, Column)]): Column =
    containmentDist(pairs, pairs.map { case (_, b) =>
      call_function("bit_count", b).cast("long")
    }.reduce(_ + _))

  /** SUPERSTRUCTURE distance — the mirror metric (Milvus
    * SUPERSTRUCTURE): 1 − |a ∧ b| / |a| with `a` the STORED candidate —
    * exactly 0 iff every candidate bit is set in the query
    * (candidate ⊆ query). An all-zero candidate is contained in any
    * query (distance 0). */
  def superstructureDist(pairs: Seq[(Column, Column)]): Column =
    containmentDist(pairs, pairs.map { case (a, _) =>
      call_function("bit_count", a).cast("long")
    }.reduce(_ + _))

  /** Jaccard (Tanimoto) DISTANCE between packed signatures — the other
    * binary metric Milvus serves (JACCARD): 1 − |a ∧ b| / |a ∨ b|,
    * popcounts over the packed words (two bit_counts per word vs
    * hamming's one). Two all-zero signatures are distance 0 by
    * convention (identical), not the NULL a 0/0 would yield. Rounded
    * to 4 decimals for cross-engine rank stability. */
  def jaccardDist(pairs: Seq[(Column, Column)]): Column =
    containmentDist(pairs, pairs.map { case (a, b) =>
      call_function("bit_count", a.bitwiseOR(b)).cast("long")
    }.reduce(_ + _))
}
