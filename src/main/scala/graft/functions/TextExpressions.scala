package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token n-gram shingling.
  *
  * Semantics (kept identical to the higher-order-function formulation it
  * replaces, and to the DuckDB oracle's
  * `list_distinct(list_transform(range(...), i -> array_to_string(toks[i:i+n-1], ' ')))`):
  *
  *   toks = split(text, "\\s+")          (Java regex, limit -1)
  *   length(toks) < n      -> empty array
  *   otherwise             -> first-occurrence-distinct list of
  *                            toks[i..i+n-1] joined by one space
  *
  * Why an Expression and not `transform(sequence(...), ...)`: Spark's
  * higher-order functions are interpreted (no whole-stage codegen), and
  * profiled at ~1 ms/document they dominate every shingle-based dedup
  * operator. This kernel is one compiled method per row — the same
  * pattern as [[L2SquaredDistance]] for vector distance.
  */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def prettyName: String = "token_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument and n >= 1, " +
        s"got ${child.dataType.sql}, n=$n")

  override def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingles {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** One compiled pass per row: split, slide an n-window, join with one
    * space, first-occurrence dedup. Called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = WS.split(text.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Column-level API for the text kernels. */
object TextFunctions {
  def tokenShingles(text: Column, n: Int): Column =
    Bridge.column(TokenShingles(Bridge.expression(text), n))
}
