package graft

import graft.functions.{CosineSimilarity, DotProduct, L2SquaredDistance,
  NfcNormalize, TokenShingles}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL surface for the vector kernels: registers `graft_l2_sq`,
  * `graft_dot`, `graft_cosine_sim` so `spark.sql(...)` and BI layers can
  * call them. Wire up either at session build time
  * (`--conf spark.sql.extensions=graft.GraftExtensions`) or on a live
  * session via [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // joins the operator-optimization fixpoint, so the injected probe
    // predicate still gets pushed down to the scan afterwards
    ext.injectOptimizerRule(_ => graft.plans.IvfProbeRewrite)
  }
}

object GraftExtensions {
  private def binary(name: String, f: (Expression, Expression) => Expression)
  : (String, Seq[Expression] => Expression) =
    name -> { exprs =>
      require(exprs.length == 2, s"$name expects 2 arguments")
      f(exprs(0), exprs(1))
    }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    binary("graft_l2_sq", L2SquaredDistance.apply),
    binary("graft_dot", DotProduct.apply),
    binary("graft_cosine_sim", CosineSimilarity.apply),
    "graft_nfc_normalize" -> { exprs =>
      require(exprs.length == 1, "graft_nfc_normalize expects 1 argument")
      NfcNormalize(exprs.head)
    },
    // n must be a literal (it shapes the generated code, like the SQL
    // standard's <n> in substring — not a runtime value)
    "graft_token_shingles" -> { exprs =>
      require(exprs.length == 2,
        "graft_token_shingles expects (text, n literal)")
      val n = exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_token_shingles: n must be an INT literal, got $other")
      }
      TokenShingles(exprs.head, n)
    })

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      Bridge.registerTempFunction(spark, name, b)
    }
}
