package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the query registry. */
object QueryDsl {
  final case class Q(name: String,
                     fn: (SparkSession, String) => DataFrame,
                     oracle: Option[String])

  /** DuckDB squared-L2 over list<float> columns, double accumulation,
    * rounded — textual mirror of graft.functions.L2SquaredDistance. */
  def duckL2(a: String, b: String): String =
    s"round(list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))^2)), 4)"

  /** DuckDB cosine similarity (double accumulation, 4-decimal round) —
    * textual mirror of graft.functions.CosineSimilarity. */
  def duckCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($x)+1), " +
        s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"round(CASE WHEN ${dot(a, a)} = 0 OR ${dot(b, b)} = 0 THEN 0.0 " +
      s"ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) END, 4)"
  }
}
