package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd vector-distance kernels over `ARRAY<FLOAT>` columns.
  *
  * These are the hot-path equivalents of the Milvus-side SIMD L2 scan the
  * reference delegates to (reference: src/app.py:106-111 declares the
  * IVF_FLAT / L2 index; doc/milvus介绍.md:13 claims columnar SIMD scans).
  * Here the kernel is a tight primitive-float loop emitted into whole-stage
  * codegen — no boxing, no higher-order-function per-element lambda calls —
  * so a 100 TB scan keeps vector distance inside one codegen stage.
  *
  * Accumulation is left-to-right in double precision, matching the DuckDB
  * oracle formulation (`list_sum(list_transform(...))` over
  * `CAST(x AS DOUBLE)`), so results are bit-stable across both engines at
  * the rounding granularity used by the correctness gate.
  *
  * Null handling: `BinaryExpression.eval`/`nullSafeCodeGen` already yield
  * NULL when either array is NULL; elements are assumed non-null
  * (`containsNull=false`, enforced at ingest).
  *
  * Dimension mismatch is a DATA ERROR the type system cannot catch (both
  * sides are ARRAY<FLOAT>); the kernels define the result over the common
  * prefix (min length) rather than throwing per-row, matching the DuckDB
  * oracle formulation. Validate dimensions at ingest (the Collection
  * schema pins dim) — a mismatched scan ranks on prefix distance.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** Squared Euclidean (L2^2) distance — the reference's search metric
  * (Milvus `metric_type="L2"` returns squared L2; reference src/app.py:109).
  */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors (double accumulation). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity; 0.0 when either vector has zero norm. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 between an SQ8-quantized vector (INT components + per-vector
  * scale; see [[graft.search.Quantize]]) and a full-precision query —
  * dequantize-and-accumulate in ONE codegen pass, so the quantized
  * candidate scan of `sq8RerankSearch` stays inside whole-stage codegen
  * instead of paying interpreted `zip_with`/`aggregate` per element.
  * Semantics identical to the HOF formulation it replaces (and to the
  * DuckDB oracle): left-to-right double accumulation over the common
  * prefix; scale 0 dequantizes to 0. */
case class DequantizedL2(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "dequant_l2_sq"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), DoubleType, ArrayType(FloatType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<INT>, DOUBLE, ARRAY<FLOAT>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  override def nullSafeEval(q: Any, s: Any, v: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val va = v.asInstanceOf[ArrayData]
    val n = math.min(qa.numElements(), va.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val deq = if (scale == 0.0) 0.0 else qa.getInt(i).toDouble / scale
      val d = deq - va.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, s, v) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val deq = ctx.freshName("deq")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $v.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $deq = ($s == 0.0) ? 0.0 : (double) $q.getInt($i) / $s;
         |  double $d = $deq - (double) $v.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Signed-random-projection signature: sign bits of `bits` fixed hyperplane
  * projections of an ARRAY<FLOAT> vector — the per-row map step of the
  * SRP-LSH cosine family ([[graft.dedup.Dedup.cosineCandidatePairs]],
  * [[graft.search.AnnJoin]]). One codegen pass computes all planes
  * (`weights` is row-major `bits × dim`, shipped as a reference object),
  * replacing the interpreted `aggregate(zip_with(...))` per plane — at 64
  * planes the HOF form pays ~bits × dim lambda calls per row and dominates
  * the signature stage of a corpus-scale dedup run.
  *
  * Accumulation is left-to-right in double precision over the common
  * prefix of (dim, vector length), matching the DuckDB oracle's
  * `sum((nibble - 7.5) * x)` formulation at the sign-decision granularity.
  * Output: ARRAY<INT> of 0/1, length `bits`.
  */
case class SrpSignature(child: Expression, weights: IndexedSeq[Double],
                        bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits > 0 && weights.length % bits == 0,
    s"weights length ${weights.length} must be bits=$bits × dim")
  private val dim = weights.length / bits
  @transient private lazy val w: Array[Double] = weights.toArray

  override def prettyName: String = "srp_signature"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val out = new Array[Int](bits)
    var p = 0
    while (p < bits) {
      val off = p * dim
      var acc = 0.0
      var i = 0
      while (i < n) { acc += w(off + i) * x.getFloat(i).toDouble; i += 1 }
      out(p) = if (acc > 0) 1 else 0
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val wRef = ctx.addReferenceObj("srpWeights", w, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int[] $out = new int[$bits];
         |for (int $p = 0; $p < $bits; $p++) {
         |  int $off = $p * $dim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $wRef[$off + $i] * (double) $v.getFloat($i);
         |  }
         |  $out[$p] = ($acc > 0.0) ? 1 : 0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Masked query-sum over packed sign words — the S₁ term of the RaBitQ
  * asymmetric 1-bit estimator ([[graft.search.BinaryVec.asymCosScore]]):
  * S₁ = Σ_{j: bit j of the signature set} q̂_j, with the signature as an
  * ARRAY<BIGINT> of 32-bit big-endian packed words and q̂ a per-QUERY
  * constant shipped as a reference object. One codegen'd loop whose
  * GENERATED CODE SIZE is constant in dim — the previous formulation
  * unrolled one CASE term per dimension, which is tight at dim 64 but
  * blows past JIT/codegen method limits at dim ≥ 1024 and falls back to
  * interpreted. Accumulation is ascending-j double adds over set bits
  * only, bit-identical to the unrolled chain (adding 0.0 for an unset
  * bit is the identity), so every existing oracle hash is unchanged
  * (SearchOpsSpec pins the equality). Words past the signature's length
  * contribute nothing (absent ⇒ bit 0 — [[graft.search.BinaryVec
  * .signWord]]'s alignment contract). */
case class AsymSignDot(child: Expression, qhat: IndexedSeq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val q: Array[Double] = qhat.toArray

  override def prettyName: String = "asym_sign_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> packed sign words, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val n = math.min(q.length, words.numElements() * 32)
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (((words.getLong(j / 32) >> (31 - (j % 32))) & 1L) == 1L)
        acc += q(j)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val qRef = ctx.addReferenceObj("asymQhat", q, "double[]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($qRef.length, $v.numElements() * 32);
         |double $acc = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ((($v.getLong($j / 32) >> (31 - ($j % 32))) & 1L) == 1L) {
         |    $acc += $qRef[$j];
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the vector kernels. */
object VectorFunctions {
  def l2Sq(a: Column, b: Column): Column =
    Bridge.column(L2SquaredDistance(Bridge.expression(a), Bridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dequantL2(qvec: Column, scale: Column, query: Column): Column =
    Bridge.column(DequantizedL2(Bridge.expression(qvec),
      Bridge.expression(scale), Bridge.expression(query)))

  /** SRP sign-bit signature; `weights` is plane-major (bits rows × dim). */
  def srpSignature(vec: Column, weights: IndexedSeq[IndexedSeq[Double]]): Column =
    Bridge.column(SrpSignature(Bridge.expression(vec),
      weights.flatten.toIndexedSeq, weights.length))

  /** S₁ of the asymmetric 1-bit estimator: Σ of `qhat` over the set bits
    * of `words` (ARRAY<BIGINT> packed signature). */
  def asymSignDot(words: Column, qhat: IndexedSeq[Double]): Column =
    Bridge.column(AsymSignDot(Bridge.expression(words), qhat))
}
