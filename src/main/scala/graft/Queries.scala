package graft

import graft.QueryDsl.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The operator-coverage query registry backing [[SparkEntry]].
  *
  * Every implemented operator from SURVEY §2 gets one entry; where the
  * semantics are SQL-expressible the entry also carries a DuckDB oracle
  * string over the same parquet fixtures (driver hash-compares — see
  * BASELINE.json). Conventions for oracle parity:
  *  - every query output is deterministically ordered with full tie-breaks;
  *  - computed doubles are `round`ed (4 decimals for distances/ratios, 2
  *    for money sums) in BOTH engines so FP summation order can't flip a
  *    hash;
  *  - column names are aliased identically on both sides;
  *  - DuckDB integer `sum()`/`count()` are cast to BIGINT to match Spark.
  */
object Queries {
  val registry: Seq[Q] =
    VectorQueries.all ++
      TextQueries.all ++
      DedupQueries.all ++
      RelationalQueries.all ++
      PipelineQueries.all ++
      StreamingQueries.all ++
      ExtraQueries.all ++
      ScaleQueries.all ++
      CurateQueries.all

  def all: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
